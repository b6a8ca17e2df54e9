"""The runnable examples stay runnable (smoke; no TPU, no params)."""

import os
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]


def test_end_to_end_tx_example():
    # Pin the subprocess to CPU: the bare script would inherit the axon
    # platform and hang whenever the TPU relay is unavailable. Generous
    # timeout: a cold XLA persistent cache (first run on a new host)
    # recompiles the fixed-base pedersen programs, ~minutes each.
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    out = subprocess.run(
        [sys.executable, str(REPO / "tools/examples/end_to_end_tx.py")],
        capture_output=True, text=True, timeout=1800, env=env,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert out.stdout.strip().endswith("OK")
    assert "spend-auth signatures verify: True" in out.stdout
