"""Profile the QLoRA train step on the real chip (docs/PERF.md QLoRA section).

Times train_step on a 7B-int8 frozen base + LoRA adapters (b1, seq 512,
remat, one 1024px image) next to the forward loss alone. Note: XLA already
dead-code-eliminates the frozen base's backward (set_to_zero grads are
unused) — measured on the tiny model, the compiled LoRA step costs fwd
+ ~20% FLOPs while a full fine-tune costs ~3.9x fwd — so step time should
be close to forward time; a large gap means a platform pathology, not
wasted gradient math.

Usage:  PYTHONPATH=/root/repo:/root/.axon_site python scripts/profile_qlora.py
        [--size 7b] [--bits 8] [--seq 512] [--steps 5] [--image-size 1024]
"""

from __future__ import annotations

import argparse
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])  # repo root for bench import


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", default="7b")
    ap.add_argument("--bits", type=int, default=8)
    ap.add_argument("--seq", type=int, default=512)
    ap.add_argument("--steps", type=int, default=5)
    ap.add_argument("--image-size", type=int, default=1024)
    ap.add_argument("--no-image", action="store_true")
    ap.add_argument("--no-remat", action="store_true")
    ap.add_argument("--variants", default="fwd,step",
                    help="comma list of fwd|step")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from bench import make_model
    from fastvlm_tpu.train import lora
    from fastvlm_tpu.train import step as sm

    # fuse=False: the QLoRA trainer quantizes the UNfused decoder (q/k/v
    # separate) — match it so adapter targets/shapes agree
    cfg, params = make_model(args.size, args.image_size, "bfloat16",
                             quantize_bits=args.bits, fuse=False)
    params = dict(params)
    params["decoder"] = lora.add_lora(
        params["decoder"], jax.random.PRNGKey(0), cfg=cfg.decoder)
    tx = lora.make_lora_optimizer(params)

    B, T = 1, args.seq
    nimg = cfg.num_image_tokens
    ids = np.zeros((B, T), np.int32)
    ids[:, :] = 11
    labels = np.full((B, T), 5, np.int32)
    starts = np.full((B,), -1, np.int32)
    images = None
    if not args.no_image:
        starts[:] = 4
        labels[:, : 4 + nimg] = -100
        images = jnp.zeros((B, args.image_size, args.image_size, 3),
                           jnp.bfloat16)
    batch = {"ids": jnp.asarray(ids), "labels": jnp.asarray(labels),
             "image_starts": jnp.asarray(starts),
             "attn_lens": jnp.full((B,), T, jnp.int32)}
    if images is not None:
        batch["images"] = images

    remat = not args.no_remat
    fwd = jax.jit(lambda p, b: sm.loss_fn(p, cfg, b, remat=remat))

    for variant in args.variants.split(","):
        if variant == "fwd":
            t0 = time.perf_counter()
            v = float(np.asarray(fwd(params, batch)))
            compile_s = time.perf_counter() - t0
            t0 = time.perf_counter()
            for _ in range(args.steps):
                v = fwd(params, batch)
            v = float(np.asarray(v))
            dt = (time.perf_counter() - t0) / args.steps
            print(f"fwd-only: {dt * 1000:.1f} ms/call "
                  f"(compile+1st {compile_s:.1f}s, loss {v:.4f})", flush=True)
            continue
        st = sm.make_train_state(params, tx)
        t0 = time.perf_counter()
        st, loss = sm.train_step(st, cfg, tx, batch)
        loss = float(np.asarray(loss))
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(args.steps):
            st, loss = sm.train_step(st, cfg, tx, batch)
        loss = float(np.asarray(loss))
        dt = (time.perf_counter() - t0) / args.steps
        print(f"step: {dt * 1000:.1f} ms/step "
              f"(compile+1st {compile_s:.1f}s, loss {loss:.4f})", flush=True)


if __name__ == "__main__":
    main()
