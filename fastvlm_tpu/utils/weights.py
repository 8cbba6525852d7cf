"""Weight distribution utilities: delta make/apply and consolidation.

Equivalents of the reference's model/make_delta.py, apply_delta.py (ship
fine-tuned weights as diffs against a base LLM) and consolidate.py, operating
on our native Orbax param trees. Mismatched-shape leaves (e.g. embeddings
grown by added image tokens) are stored verbatim in the delta, matching the
reference's special-casing of embed_tokens/lm_head (apply_delta.py).

CLI:
  python -m fastvlm_tpu.utils.weights make-delta --base B --target T --delta D
  python -m fastvlm_tpu.utils.weights apply-delta --base B --delta D --target T
  python -m fastvlm_tpu.utils.weights consolidate --src DIR --dst DIR
"""

from __future__ import annotations

import argparse
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np


def _flatten(tree: Any, prefix: str = "") -> Dict[str, Any]:
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten(v, f"{prefix}{k}/"))
    elif isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            out.update(_flatten(v, f"{prefix}{i}/"))
    else:
        out[prefix[:-1]] = tree
    return out


def make_delta(base: Any, target: Any) -> Any:
    """delta = target - base per leaf; shape-mismatched leaves stored whole
    (marked by an extra leading wrap is unnecessary — apply checks shapes)."""
    def leaf(b, t):
        if b.shape != t.shape or b.dtype != t.dtype:
            return t
        return (np.asarray(t, np.float32) - np.asarray(b, np.float32)).astype(
            np.asarray(t).dtype)

    return jax.tree.map(leaf, base, target)


def apply_delta(base: Any, delta: Any) -> Any:
    def leaf(b, d):
        if b.shape != d.shape or b.dtype != d.dtype:
            return d  # stored verbatim
        return (np.asarray(b, np.float32) + np.asarray(d, np.float32)).astype(
            np.asarray(d).dtype)

    return jax.tree.map(leaf, base, delta)


def consolidate(params: Any) -> Any:
    """Gather every (possibly sharded/committed-on-device) leaf to host
    memory as a single-replica tree (reference consolidate.py)."""
    return jax.tree.map(lambda x: np.asarray(x), params)


def main(argv=None):
    # delta tooling is host-side: pin to CPU so Orbax restores CPU-saved
    # checkpoints regardless of what accelerator plugin is ambient
    jax.config.update("jax_platforms", "cpu")
    from fastvlm_tpu.utils.checkpoint import restore_native, save_native

    parser = argparse.ArgumentParser()
    sub = parser.add_subparsers(dest="cmd", required=True)
    for name in ("make-delta", "apply-delta"):
        p = sub.add_parser(name)
        p.add_argument("--base", required=True)
        p.add_argument("--target", required=True)
        p.add_argument("--delta", required=True)
    pc = sub.add_parser("consolidate")
    pc.add_argument("--src", required=True)
    pc.add_argument("--dst", required=True)
    args = parser.parse_args(argv)

    if args.cmd == "make-delta":
        base = restore_native(args.base, None)
        target = restore_native(args.target, None)
        save_native(args.delta, make_delta(base, target))
    elif args.cmd == "apply-delta":
        base = restore_native(args.base, None)
        delta = restore_native(args.delta, None)
        save_native(args.target, apply_delta(base, delta))
    else:
        src = restore_native(args.src, None)
        save_native(args.dst, consolidate(src))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
