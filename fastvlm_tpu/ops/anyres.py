"""AnyRes tile-feature merging (reference llava_arch.py:154-208 + unpad_image
at :101-129).

The reference encodes [global view + grid tiles] and merges features per
``mm_patch_merge_type``:
  flat           — tiles' tokens concatenated;
  spatial        — tiles re-assembled into one big (gh*h, gw*w) grid, an
                   ``image_newline`` embedding appended to each row;
  spatial_unpad  — same, but the grid is first cropped back to the original
                   aspect ratio (undo resize_and_pad letterboxing).

TPU design: everything here is static-shape given (grid_shape, original_size),
both known on the host from the image header before any pixel work — each
distinct (grid, aspect-bucket) pair compiles once. Features arrive as
(T, h, w, C) NHWC grids straight from fastvit.features_grid.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp


def unpad_hw(cur_hw: Tuple[int, int], original_size: Tuple[int, int]):
    """Crop box that undoes centered letterbox padding.

    cur_hw: (H, W) of the feature grid; original_size: (width, height) of the
    raw image (reference unpad_image, llava_arch.py:101-129). Returns
    (top, bottom, left, right) slice bounds.
    """
    cur_h, cur_w = cur_hw
    ow, oh = original_size
    original_ar = ow / oh
    current_ar = cur_w / cur_h
    if original_ar > current_ar:
        # letterboxed vertically: crop rows back
        scale = cur_w / ow
        new_h = int(oh * scale)
        pad = (cur_h - new_h) // 2
        return pad, cur_h - pad, 0, cur_w
    # letterboxed horizontally: crop columns back
    scale = cur_h / oh
    new_w = int(ow * scale)
    pad = (cur_w - new_w) // 2
    return 0, cur_h, pad, cur_w - pad


def merge_flat(tile_feats: jnp.ndarray) -> jnp.ndarray:
    """(T, h, w, C) -> (T*h*w, C): plain token concatenation."""
    t, h, w, c = tile_feats.shape
    return tile_feats.reshape(t * h * w, c)


def merge_spatial(
    tile_feats: jnp.ndarray,           # (1 + gw*gh, h, w, C): global + tiles
    grid_shape: Tuple[int, int],       # (grid_w, grid_h) in tiles
    image_newline: Optional[jnp.ndarray] = None,  # (C,)
    original_size: Optional[Tuple[int, int]] = None,  # (width, height)
    unpad: bool = False,
    crop_box: Optional[Tuple[int, int, int, int]] = None,
) -> jnp.ndarray:
    """Reference spatial/spatial_unpad merge. Returns (N, C) tokens:
    [global-view tokens | assembled grid tokens (+ newline per row)].

    For unpad merges the crop may be given directly as ``crop_box``
    (top, bottom, left, right) — precomputed on the host via unpad_hw — so
    that a jit of this function is keyed on the (few) distinct crop boxes
    rather than exact pixel image sizes."""
    gw, gh = grid_shape
    base = tile_feats[0]                     # (h, w, C) global view
    tiles = tile_feats[1:]                   # (gh*gw, h, w, C), row-major
    _, h, w, c = tile_feats.shape

    # (gh, gw, h, w, C) -> (gh*h, gw*w, C)
    grid = tiles.reshape(gh, gw, h, w, c).transpose(0, 2, 1, 3, 4)
    grid = grid.reshape(gh * h, gw * w, c)

    if unpad:
        if crop_box is None:
            assert original_size is not None
            crop_box = unpad_hw((gh * h, gw * w), original_size)
        top, bottom, left, right = crop_box
        grid = grid[top:bottom, left:right]

    if image_newline is not None:
        nl = jnp.broadcast_to(
            image_newline.astype(grid.dtype)[None, None, :],
            (grid.shape[0], 1, c))
        grid = jnp.concatenate([grid, nl], axis=1)

    return jnp.concatenate([base.reshape(h * w, c), grid.reshape(-1, c)], axis=0)


def num_merged_tokens(
    grid_shape: Tuple[int, int],
    feat_hw: int,
    merge_type: str = "flat",
    original_size: Optional[Tuple[int, int]] = None,
) -> int:
    """Host-side token count for sentinel expansion (must match merge_*)."""
    gw, gh = grid_shape
    h = w = feat_hw
    if merge_type == "flat":
        return (1 + gw * gh) * h * w
    gh_px, gw_px = gh * h, gw * w
    newline = 0
    if "unpad" in merge_type:
        top, bottom, left, right = unpad_hw((gh_px, gw_px), original_size)
        gh_px, gw_px = bottom - top, right - left
        # image_newline row separators exist only for 'unpad' merges
        # (reference creates the param iff 'unpad' in merge type,
        # llava_arch.py:37-47, and only that branch appends it)
        newline = gh_px
    return h * w + gh_px * gw_px + newline
