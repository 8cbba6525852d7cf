"""Prompt-lookup (n-gram) speculative decoding — exact greedy, on device.

Single-sequence decode is weight-bandwidth-bound on TPU: one decode step
streams every decoder weight from HBM to produce ONE token's logits. A
verify pass over k+1 tokens streams the same weights once (the extra MXU
work at M=k+1 is free under the bandwidth roofline), so if a cheap draft
predicts the next k tokens with acceptance rate a, greedy decode runs up to
(1+a*k)x faster with BIT-IDENTICAL output.

This implements self-speculation via prompt lookup (the draft "model" is an
n-gram match against the tokens already seen — prompt + generation), which
needs no second model and shines exactly where VLM serving spends time:
captioning/OCR answers that copy spans of the prompt or repeat earlier
phrasing, and video-QA where consecutive frames produce near-identical
answers. The reference's HF stack exposes the same technique as
``prompt_lookup_num_tokens`` (transformers assisted decoding); here it is a
static-shape lax.while_loop that composes with the existing KV cache and
qwen2.forward — no per-token host round trips, no retraces.

Greedy only: speculative rejection sampling for temperature>0 requires
distribution-level corrections; the engine falls back to plain decode when
sampling is stochastic.

Shapes are fully static: draft length ``k`` is compile-time; each verify
step writes k+1 cache slots at per-row offsets (ops/kv_cache.write_token
handles (B, T, H, D)) and accepts a variable 1..k+1 tokens by advancing
per-row counters — rejected slots are simply overwritten by the next step
(attention masks key positions >= lengths, so stale KV is never read).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
from jax import lax


class SpecResult(NamedTuple):
    tokens: jnp.ndarray         # (B, max_new_tokens) int32, zero after EOS
    num_generated: jnp.ndarray  # (B,) int32 (including the EOS token)
    steps: jnp.ndarray          # () int32 — verify passes taken
    drafted: jnp.ndarray        # () int32 — draft tokens proposed (active rows)
    accepted: jnp.ndarray       # () int32 — draft tokens accepted


def ngram_draft(hist: jnp.ndarray, hist_len: jnp.ndarray, k: int,
                n: int = 3) -> jnp.ndarray:
    """Propose k draft tokens per row by prompt lookup.

    Finds the most recent earlier occurrence of each row's trailing n-gram
    in hist[:hist_len] and returns the k tokens that followed it. Rows with
    no match draft a repeat of their last token (harmless: acceptance just
    drops to the guaranteed 1 real token/step).

    hist: (B, L) int32 token history (prompt + generated, right-padded);
    hist_len: (B,) valid counts (>= n). Static shapes; jit-safe.
    """
    b, l = hist.shape
    # trailing n-gram per row
    tail = jax.vmap(
        lambda h, s: lax.dynamic_slice(h, (s,), (n,)))(
            hist, jnp.clip(hist_len - n, 0, l - n))        # (B, n)
    # match positions: hist[p:p+n] == tail, via n static shifted comparisons
    eq = jnp.ones((b, l - n + 1), bool)
    for i in range(n):
        eq = eq & (hist[:, i:l - n + 1 + i] == tail[:, i:i + 1])
    pos = jnp.arange(l - n + 1, dtype=jnp.int32)[None, :]
    # exclude the trailing n-gram itself (p = hist_len - n) and anything after
    valid = eq & (pos < (hist_len - n)[:, None])
    p = jnp.max(jnp.where(valid, pos, -1), axis=-1)        # (B,) -1 = no match
    has = p >= 0
    start = jnp.clip(jnp.where(has, p + n, 0), 0, l - k)
    draft = jax.vmap(
        lambda h, s: lax.dynamic_slice(h, (s,), (k,)))(hist, start)
    last = tail[:, -1:]
    return jnp.where(has[:, None], draft, jnp.broadcast_to(last, (b, k)))


def spec_mask(lengths: jnp.ndarray, t: int, s_max: int,
              window=None) -> jnp.ndarray:
    """(B, T, S_max) verify-step mask: query i of row b sits at position
    lengths[b]+i and attends keys k_pos <= lengths[b]+i (its own KV was just
    written, like qwen2.decode_mask's convention)."""
    q_pos = lengths[:, None, None] + jnp.arange(t, dtype=jnp.int32)[None, :, None]
    k_pos = jnp.arange(s_max, dtype=jnp.int32)[None, None, :]
    m = k_pos <= q_pos
    if window is not None:
        m = m & (q_pos - k_pos < window)
    return m


def accept_counts(draft: jnp.ndarray, verified: jnp.ndarray) -> jnp.ndarray:
    """(B, k) draft vs (B, k) model-verified next tokens -> (B,) length of
    the longest accepted prefix (standard greedy speculative acceptance)."""
    match = (draft == verified).astype(jnp.int32)
    return jnp.sum(jnp.cumprod(match, axis=-1), axis=-1)


def masked_window_write(row: jnp.ndarray, vec: jnp.ndarray,
                        start: jnp.ndarray, count: jnp.ndarray,
                        width: int) -> jnp.ndarray:
    """Write ``vec[:count]`` into ``row`` at ``start`` through a static
    ``width`` window (positions >= count keep their old values) — the
    speculative commit primitive: every verify pass produces a static
    k+1-token vector of which a dynamic 0..k+1 prefix is accepted. Shared
    by the whole-generation loop, the verify pass's history update, and the
    streaming chunk (models/vlm.py) so the clamp/mask semantics can't
    drift between paths. vmap over rows."""
    old = lax.dynamic_slice(row, (start,), (width,))
    vec = jnp.where(jnp.arange(width) < count, vec, old)
    return lax.dynamic_update_slice(row, vec, (start,))
