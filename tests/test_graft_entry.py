"""The driver's contract surface: entry() and dryrun_multichip(n).

Round-1 failure mode (VERDICT.md #1): the driver imports __graft_entry__ and
calls dryrun_multichip(8) in a process where jax sees ONE device; the function
must self-provision a virtual mesh rather than assume the caller prepared one.
"""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_dryrun_multichip_in_process():
    """With >= n devices visible (conftest's 8-CPU mesh), runs in-process.

    slow tier: the driver executes dryrun_multichip every round
    (MULTICHIP_r*.json) and `python __graft_entry__.py` self-tests it, so
    the fast gate does not pay its 160 s shard_map compile stack."""
    sys.path.insert(0, REPO)
    try:
        from __graft_entry__ import dryrun_multichip
    finally:
        sys.path.pop(0)
    dryrun_multichip(8)


@pytest.mark.slow
def test_dryrun_multichip_driver_path():
    """Exactly the driver's invocation: a fresh process with ONE device
    (no XLA_FLAGS prep) imports __graft_entry__ and calls dryrun_multichip(8).
    The function must re-exec itself onto a virtual 8-device mesh."""
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # no pre-provisioned device count
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    code = (
        "import jax\n"
        "jax.config.update('jax_platforms', 'cpu')\n"
        "assert len(jax.devices()) == 1, jax.devices()\n"
        "from __graft_entry__ import dryrun_multichip\n"
        "dryrun_multichip(8)\n"
    )
    proc = subprocess.run([sys.executable, "-c", code], env=env, cwd=REPO,
                          capture_output=True, text=True, timeout=900)
    assert proc.returncode == 0, proc.stderr[-3000:]
    assert "dryrun_multichip ok" in proc.stdout
