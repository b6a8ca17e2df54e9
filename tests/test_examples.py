"""The runnable examples stay runnable (smoke; no TPU, no params)."""

import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]


def test_end_to_end_tx_example():
    out = subprocess.run(
        [sys.executable, str(REPO / "tools/examples/end_to_end_tx.py")],
        capture_output=True, text=True, timeout=300,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert out.stdout.strip().endswith("OK")
    assert "spend-auth signatures verify: True" in out.stdout
