"""Multi-host (2-process x 4-device) dryrun — see tools/multihost_dryrun.py.

Real jax.distributed over a localhost gRPC coordinator with Gloo CPU
collectives: per-host input pipeline, cross-host grad psum, densify and
capacity growth on a multi-host mesh (BASELINE config 5 / SURVEY §2.3)."""
import os
import subprocess
import sys

import pytest


@pytest.mark.slow
def test_multihost_dryrun():
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    r = subprocess.run(
        [sys.executable, os.path.join(root, "tools", "multihost_dryrun.py")],
        capture_output=True, text=True, timeout=900, cwd=root)
    assert r.returncode == 0, f"{r.stdout[-2000:]}\n{r.stderr[-2000:]}"
    assert "multihost dryrun OK" in r.stdout
