"""Multi-host bring-up (VERDICT r1 #8): two real processes, one coordinator,
cross-process collectives over a global mesh — the plumbing a TPU pod launch
uses, simulated on virtual CPU devices."""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_two_process_simulation():
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + ":" + env.get("PYTHONPATH", "")
    env.pop("XLA_FLAGS", None)  # probe sets its own device count
    out = subprocess.run(
        ["bash", os.path.join(REPO, "scripts", "train_multihost.sh"),
         "--simulate", "2"],
        capture_output=True, text=True, timeout=240, env=env)
    assert out.returncode == 0, out.stdout + out.stderr
    # the launcher writes each process's output to its own file and replays
    # it with a "[procN] " prefix — concurrent-writer interleaving (which
    # made this test flaky) can no longer split or merge lines
    oks = [l for l in out.stdout.splitlines()
           if l.split("] ", 1)[-1].startswith("MULTIHOST_OK")]
    assert len(oks) == 2, out.stdout + out.stderr
    assert any("0/2" in l for l in oks) and any("1/2" in l for l in oks)
    assert all("4 global" in l for l in oks)
