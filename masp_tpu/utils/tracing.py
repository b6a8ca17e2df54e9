"""Tracing & profiling: span timers + XProf device profiles.

The reference wires pprof flamegraph profiling into its criterion
benches (masp_proofs/Cargo.toml:55-56, pprof + criterion features) and
sprinkles tracing logs through the batch validator. The TPU-native
equivalents:

* :class:`Tracer` / :func:`span` — nested wall-clock spans with call
  counts, collected process-wide when ``MASP_TRACE=1`` (or after
  :func:`enable`). ``report()`` renders a flamegraph-style indented
  table; hot prover phases (witness, NTT, MSM, dispatch waits) are
  annotated at their call sites.
* :func:`device_profile` — context manager around ``jax.profiler`` that
  dumps an XProf/TensorBoard trace directory (the TPU analogue of a
  flamegraph: per-HLO device timeline). Enabled in bench.py with
  ``MASP_PROFILE=<dir>``.

Spans measure *host-observed* time: device work launched asynchronously
inside a span is attributed to wherever the stream is awaited
(block_until_ready / fetch), mirroring how the dispatch-bound round-1
MSM was diagnosed.
"""

from __future__ import annotations

import os
import time
from contextlib import contextmanager
from dataclasses import dataclass, field


@dataclass
class _Node:
    total: float = 0.0
    count: int = 0
    children: dict = field(default_factory=dict)


class Tracer:
    """Hierarchical span accumulator. Thread-compatible (single-threaded
    use per instance; the module-level tracer is per-process)."""

    def __init__(self, enabled: bool = True):
        self.enabled = enabled
        self.root = _Node()
        self._stack: list[_Node] = [self.root]

    @contextmanager
    def span(self, name: str):
        if not self.enabled:
            yield
            return
        parent = self._stack[-1]
        node = parent.children.setdefault(name, _Node())
        self._stack.append(node)
        t0 = time.perf_counter()
        try:
            yield
        finally:
            node.total += time.perf_counter() - t0
            node.count += 1
            self._stack.pop()

    def reset(self):
        self.root = _Node()
        self._stack = [self.root]

    def rows(self):
        """Flatten to (depth, name, total_s, count, self_s) rows."""
        out = []

        def walk(node: _Node, depth: int):
            for name, child in node.children.items():
                child_sum = sum(c.total for c in child.children.values())
                out.append(
                    (depth, name, child.total, child.count,
                     child.total - child_sum)
                )
                walk(child, depth + 1)

        walk(self.root, 0)
        return out

    def report(self) -> str:
        rows = self.rows()
        if not rows:
            return "(no spans recorded)"
        width = max(len("  " * d + n) for d, n, *_ in rows) + 2
        lines = [f"{'span':<{width}} {'total':>9} {'calls':>6} {'self':>9}"]
        for depth, name, total, count, self_s in rows:
            label = "  " * depth + name
            lines.append(
                f"{label:<{width}} {total:>8.3f}s {count:>6} {self_s:>8.3f}s"
            )
        return "\n".join(lines)


_tracer = Tracer(enabled=os.environ.get("MASP_TRACE") == "1")


def enable(on: bool = True):
    _tracer.enabled = on


def span(name: str):
    """Module-level span against the process tracer (cheap no-op unless
    MASP_TRACE=1 / enable())."""
    return _tracer.span(name)


def report() -> str:
    return _tracer.report()


def reset():
    _tracer.reset()


@contextmanager
def device_profile(log_dir: str | None):
    """Capture an XProf device profile into ``log_dir`` (inspect with
    TensorBoard / xprof). No-op when log_dir is falsy."""
    if not log_dir:
        yield
        return
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


__all__ = ["Tracer", "span", "report", "reset", "enable", "device_profile"]
