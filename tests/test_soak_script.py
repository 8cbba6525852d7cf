"""Regression coverage for scripts/soak_serving.py (the live-chip storm
soak): the tiny-config CPU run must keep passing all its invariant checks
(clean termination, cancels honored, pool fully free, no error chunks).
The script is the hardware-evidence harness for docs/PERF.md's round-5
serving section — this keeps it from bitrotting between rounds."""

import json
import pathlib
import subprocess
import sys

import pytest

REPO = pathlib.Path(__file__).resolve().parent.parent


@pytest.mark.slow
def test_soak_script_tiny_all_checks_green():
    # subprocess: the script builds its own engine/scheduler and the soak
    # threads + timers should not share this process's jit caches
    out = subprocess.run(
        [sys.executable, "scripts/soak_serving.py", "--size", "tiny",
         "--n", "8", "--arrival", "0.05", "--pool-tokens", "4096"],
        cwd=REPO, capture_output=True, text=True, timeout=900,
        env={**__import__("os").environ, "JAX_PLATFORMS": "cpu",
             "FASTVLM_NO_COMPILE_CACHE": "1"},
    )
    assert out.returncode == 0, out.stderr[-2000:]
    payload = json.loads(out.stdout.strip().splitlines()[-1])
    assert payload["ok"], payload
    assert payload["checks"] == {k: True for k in payload["checks"]}
    # the plan mixes all four admission flavors even at n=8
    assert payload["reasons"].get("length", 0) >= 5, payload
    assert payload["counters"].get("cancelled", 0) >= 1, payload
