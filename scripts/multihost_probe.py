#!/usr/bin/env python
"""Multi-host bring-up probe: initialize jax.distributed, build a global
mesh spanning every process, run one cross-process collective and one
DP-sharded train-style step, print MULTIHOST_OK.

Run on every worker (the launcher scripts/train_multihost.sh does this):

    python scripts/multihost_probe.py --coordinator host:port \
        --num-processes N --process-id I [--platform cpu] [--local-devices K]

On a TPU pod slice, omit the coordinator flags (autodetected).
Exits non-zero if the collective result is wrong on any process.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--coordinator", default=None)
    p.add_argument("--num-processes", type=int, default=None)
    p.add_argument("--process-id", type=int, default=None)
    p.add_argument("--platform", default=None)
    p.add_argument("--local-devices", type=int, default=None,
                   help="virtual CPU devices per process (simulation)")
    args = p.parse_args(argv)

    if args.local_devices:
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={args.local_devices}")
    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    from fastvlm_tpu.parallel.distributed import initialize, is_primary

    initialize(args.coordinator, args.num_processes, args.process_id)

    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    n = jax.device_count()
    local = jax.local_device_count()
    mesh = Mesh(np.asarray(jax.devices()).reshape(n), ("data",))

    # cross-process collective: global sum of per-device ranks
    sharding = NamedSharding(mesh, P("data"))
    ranks = jax.make_array_from_callback(
        (n,), sharding, lambda idx: np.arange(n, dtype=np.float32)[idx])
    total = jax.jit(lambda x: jnp.sum(x), out_shardings=None)(ranks)
    want = n * (n - 1) / 2
    got = float(np.asarray(total))
    ok = abs(got - want) < 1e-6

    # DP-sharded grad step plumbing (psum over DCN)
    def loss_fn(w, x):
        return jnp.mean((x @ w) ** 2)

    w = jax.device_put(jnp.ones((4, 4)), NamedSharding(mesh, P()))
    x = jax.make_array_from_callback(
        (n, 4), NamedSharding(mesh, P("data")),
        lambda idx: np.ones((len(range(*idx[0].indices(n))), 4), np.float32))
    g = jax.jit(jax.grad(loss_fn))(w, x)
    ok = ok and bool(np.all(np.isfinite(np.asarray(g))))

    print(f"MULTIHOST_OK process={jax.process_index()}/{jax.process_count()} "
          f"devices={local} local / {n} global sum={got} primary={is_primary()}"
          if ok else "MULTIHOST_FAIL", flush=True)
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
