"""Image-token splice as a vectorized on-device gather.

The reference rebuilds each batch row with a per-sample Python loop
(llava/model/llava_arch.py:240-317): split input_ids at the IMAGE_TOKEN_INDEX
(-200) sentinel, embed the text pieces, and concatenate
[text | image features | text], then re-pad the batch. That loop is
host-bound and shape-dynamic — hostile to XLA.

TPU-native replacement: the host expands the sentinel to ``num_image_tokens``
placeholder slots when tokenizing (cheap, python-side, one integer insert), so
device-side sequence length is static. The device then *overlays* the
projected vision embeddings onto the placeholder span with a masked gather —
a single fused select, no scatter, no per-row loop, identical result for any
per-row image position.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import jax.numpy as jnp
import numpy as np


def expand_image_ids(
    ids: Sequence[int],
    num_image_tokens: int,
    image_token_index: int = -200,
    pad_id: int = 0,
) -> Tuple[np.ndarray, int]:
    """Host-side: replace the -200 sentinel with N placeholder ids.

    Returns (expanded_ids, image_start). image_start = -1 if no sentinel
    (text-only row). Mirrors tokenizer_image_token splicing
    (reference mm_utils.py:187-206) but to a static length.
    """
    ids = list(ids)
    if image_token_index not in ids:
        return np.asarray(ids, np.int32), -1
    pos = ids.index(image_token_index)
    if image_token_index in ids[pos + 1:]:
        raise ValueError(
            "multiple <image> sentinels in a single-image row; use "
            "expand_image_ids_multi"
        )
    out = ids[:pos] + [pad_id] * num_image_tokens + ids[pos + 1:]
    return np.asarray(out, np.int32), pos


def expand_image_ids_multi(
    ids: Sequence[int],
    num_image_tokens: int,
    image_token_index: int = -200,
    pad_id: int = 0,
) -> Tuple[np.ndarray, List[int]]:
    """Multi-image variant: every sentinel expands to N placeholder slots
    (reference splice loop handles arbitrarily many -200s per row,
    llava_arch.py:240-317). Returns (expanded_ids, [start0, start1, ...])."""
    out: List[int] = []
    starts: List[int] = []
    for tok in ids:
        if tok == image_token_index:
            starts.append(len(out))
            out.extend([pad_id] * num_image_tokens)
        else:
            out.append(tok)
    return np.asarray(out, np.int32), starts


def pad_batch(
    rows: List[np.ndarray],
    image_starts: Sequence[int],
    pad_to: int,
    pad_id: int = 0,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Right-pad expanded rows to a bucket length.

    Returns (ids (B,T), seq_lens (B,), image_starts (B,)).
    """
    b = len(rows)
    ids = np.full((b, pad_to), pad_id, np.int32)
    seq_lens = np.zeros((b,), np.int32)
    for i, r in enumerate(rows):
        if len(r) > pad_to:
            raise ValueError(f"row {i} length {len(r)} exceeds bucket {pad_to}")
        ids[i, : len(r)] = r
        seq_lens[i] = len(r)
    return ids, seq_lens, np.asarray(image_starts, np.int32)


def overlay_image_embeds(
    text_embeds: jnp.ndarray,   # (B, T, D)
    image_embeds: jnp.ndarray,  # (B, N, D) projected vision tokens
    image_starts: jnp.ndarray,  # (B,) int32; -1 => no image in that row
) -> jnp.ndarray:
    """Overlay vision embeddings onto positions [start, start+N) per row."""
    b, t, d = text_embeds.shape
    n = image_embeds.shape[1]
    pos = jnp.arange(t, dtype=jnp.int32)[None, :]            # (1, T)
    start = image_starts[:, None]                            # (B, 1)
    in_span = (start >= 0) & (pos >= start) & (pos < start + n)
    rel = jnp.clip(pos - start, 0, n - 1)                    # (B, T)
    gathered = jnp.take_along_axis(
        image_embeds, rel[:, :, None].astype(jnp.int32), axis=1
    )                                                        # (B, T, D)
    return jnp.where(in_span[:, :, None], gathered.astype(text_embeds.dtype),
                     text_embeds)


def overlay_image_embeds_multi(
    text_embeds: jnp.ndarray,    # (B, T, D)
    image_embeds: jnp.ndarray,   # (B, M, N, D) — M images per row
    image_starts: jnp.ndarray,   # (B, M); -1 marks absent slots
) -> jnp.ndarray:
    """Overlay M image spans per row (one fused select per image)."""
    m = image_embeds.shape[1]
    out = text_embeds
    for j in range(m):
        out = overlay_image_embeds(out, image_embeds[:, j], image_starts[:, j])
    return out
