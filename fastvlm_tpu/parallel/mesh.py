"""Device mesh construction.

The TPU-native replacement for the reference's torch.distributed/NCCL layer
(SURVEY.md §2.4): a 2-D ("data", "model") mesh over ICI. DP shards the batch;
TP shards the 7B decoder's attention heads / MLP columns. Collectives are
inserted by XLA GSPMD from NamedShardings — no explicit NCCL calls to port.

Multi-host: call ``jax.distributed.initialize()`` before ``make_mesh`` and the
same code lays DP over DCN and TP within each ICI domain (devices are sorted
host-major by default).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(
    dp: Optional[int] = None,
    tp: int = 1,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Create a (data, model) mesh. dp defaults to n_devices // tp."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if dp is None:
        if n % tp:
            raise ValueError(f"{n} devices not divisible by tp={tp}")
        dp = n // tp
    if dp * tp != n:
        raise ValueError(f"dp*tp = {dp * tp} != device count {n}")
    arr = np.asarray(devices).reshape(dp, tp)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Batch-dim sharding for inputs."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def seq_sharding(mesh: Mesh) -> NamedSharding:
    """(B, T, D) activation sharding for sequence-parallel training: batch
    over "data", tokens over "model". Passed to train_step/qwen2.forward as
    ``seq_sharding`` — GSPMD rewrites the TP all-reduces into
    reduce-scatter/all-gather pairs so inter-block activations hold T/tp
    tokens per chip (the Megatron-SP memory saving, XLA-native)."""
    return NamedSharding(mesh, P(DATA_AXIS, MODEL_AXIS, None))
