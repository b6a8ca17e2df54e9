"""Append-only benchmark log: every successful measurement lands in
benches/bench_log.jsonl with its raw samples, so medians stay auditable,
regressions bisectable, and a later TPU-tunnel outage can fall back to the
most recent real result (bench.py orchestrator does exactly that).
"""

from __future__ import annotations

import json
import os
import sys
import time

BENCH_LOG = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "benches", "bench_log.jsonl",
)


def emit(result: dict, samples: list | None = None, **extra) -> None:
    """Print one JSON result line AND append it (with raw samples and a
    timestamp) to the bench log. Logging failures never fail the bench."""
    print(json.dumps(result), flush=True)
    try:
        os.makedirs(os.path.dirname(BENCH_LOG), exist_ok=True)
        entry = dict(result)
        entry["ts"] = time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime())
        if samples is not None:
            entry["samples_s"] = [round(float(s), 5) for s in samples]
        entry.update(extra)
        try:
            import jax

            entry.setdefault("backend", jax.default_backend())
        except Exception:
            pass
        with open(BENCH_LOG, "a") as f:
            f.write(json.dumps(entry) + "\n")
    except OSError as exc:
        print(f"benchlog: could not append {BENCH_LOG}: {exc}",
              file=sys.stderr)


__all__ = ["emit", "BENCH_LOG"]
