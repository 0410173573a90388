"""The shipped example must run end-to-end (reference
tests/examples/test_examples.py runs its example scripts the same way)."""

from __future__ import annotations

import os
import subprocess
import sys


def test_preprocess_trajectories_example():
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = subprocess.run(
        [sys.executable, os.path.join(repo, "examples", "preprocess_trajectories.py"),
         "/root/reference/tests/data/geolife"],
        capture_output=True, text=True, timeout=300, check=True,
    )
    assert "trips:" in out.stdout and "plot layers:" in out.stdout, out.stdout[-2000:]
