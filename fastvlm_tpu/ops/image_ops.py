"""On-device image preprocessing as fused XLA ops.

TPU-native counterpart of the host path (data/preprocessing.py): uint8 frames
go to the device once and resize / crop / rescale / tiling all compile into
the same XLA program as the encoder, so the encode step consumes raw camera or
decoded-JPEG buffers directly (the reference does all of this in PIL on CPU —
llava/mm_utils.py — and its Swift port re-implements it in vImage,
app/FastVLM/MediaProcessingExtensions.swift).

Shapes are static per (H, W) — distinct input resolutions trigger one
compile each and are then cached, which matches serving reality (a handful of
camera/document resolutions).
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp


def rescale(x: jnp.ndarray) -> jnp.ndarray:
    """uint8 [0,255] -> float32 [0,1]; float inputs are assumed already
    rescaled and pass through (mean 0 / std 1: no normalization,
    reference mobileclip_encoder.py:45-49). Dtype dispatch is trace-static."""
    if x.dtype == jnp.uint8:
        return x.astype(jnp.float32) / 255.0
    return x.astype(jnp.float32)


def resize_bicubic(x: jnp.ndarray, out_h: int, out_w: int) -> jnp.ndarray:
    """(..., H, W, 3) bicubic resize with antialiasing (PIL-equivalent)."""
    shape = x.shape[:-3] + (out_h, out_w, x.shape[-1])
    return jax.image.resize(x.astype(jnp.float32), shape, method="bicubic",
                            antialias=True)


def resize_shortest_edge(x: jnp.ndarray, size: int) -> jnp.ndarray:
    h, w = x.shape[-3], x.shape[-2]
    if h <= w:
        nh, nw = size, int(size * w / h)
    else:
        nh, nw = int(size * h / w), size
    return resize_bicubic(x, nh, nw)


def center_crop(x: jnp.ndarray, size: int) -> jnp.ndarray:
    h, w = x.shape[-3], x.shape[-2]
    top, left = (h - size) // 2, (w - size) // 2
    return x[..., top:top + size, left:left + size, :]


def pad_to_square(x: jnp.ndarray, fill: float = 0.0) -> jnp.ndarray:
    """Centered pad to square (reference expand2square, mm_utils.py:154-165;
    FastVLM's mean-color fill is black)."""
    h, w = x.shape[-3], x.shape[-2]
    side = max(h, w)
    ph, pw = side - h, side - w
    pads = [(0, 0)] * (x.ndim - 3) + [
        (ph // 2, ph - ph // 2), (pw // 2, pw - pw // 2), (0, 0)]
    return jnp.pad(x.astype(jnp.float32), pads, constant_values=fill)


@functools.partial(jax.jit, static_argnames=("image_size", "mode"))
def preprocess(image: jnp.ndarray, image_size: int, mode: str = "pad") -> jnp.ndarray:
    """(H, W, 3) or (B, H, W, 3) uint8/float -> (B, S, S, 3) float32 in
    [0,1], fused on device (B=1 for unbatched input).

    mode 'pad':  expand2square -> resize -> (crop no-op)    [FastVLM default]
    mode 'none': resize shortest edge -> center crop
    """
    x = rescale(image)
    if mode == "pad":
        x = pad_to_square(x)
        x = resize_bicubic(x, image_size, image_size)
    else:
        x = resize_shortest_edge(x, image_size)
        x = center_crop(x, image_size)
    # clip bicubic overshoot (PIL clips at uint8 per pass)
    x = jnp.clip(x, 0.0, 1.0)
    return x if x.ndim == 4 else x[None]


def anyres_tiles(
    image: jnp.ndarray,
    image_size: int,
    best_resolution: Tuple[int, int],
) -> jnp.ndarray:
    """(H, W, 3) -> (1 + grid_w*grid_h, S, S, 3): global view + row-major tiles.

    Device version of process_anyres_image (reference mm_utils.py:121-147).
    ``best_resolution`` (width, height) comes from the host's
    select_best_resolution (static python math on the image header — no pixel
    work), so the tile grid is static under jit.
    """
    x = rescale(image)
    h, w = x.shape[0], x.shape[1]
    tw, th = best_resolution

    # aspect-preserving resize + centered zero-pad (mm_utils.py:44-76)
    scale_w, scale_h = tw / w, th / h
    if scale_w < scale_h:
        nw, nh = tw, min(-(-h * tw // w), th)
    else:
        nh, nw = th, min(-(-w * th // h), tw)
    nw, nh = int(nw), int(nh)
    resized = resize_bicubic(x, nh, nw)
    canvas = jnp.zeros((th, tw, 3), jnp.float32)
    canvas = jax.lax.dynamic_update_slice(
        canvas, resized, ((th - nh) // 2, (tw - nw) // 2, 0))

    tiles = [resize_bicubic(x, image_size, image_size)]  # global view
    for i in range(0, th, image_size):
        for j in range(0, tw, image_size):
            tiles.append(canvas[i:i + image_size, j:j + image_size])
    return jnp.stack(tiles)
