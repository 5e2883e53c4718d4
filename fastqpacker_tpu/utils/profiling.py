"""Profiling hooks: JAX/XLA traces + wall-clock stage timing.

The reference's profiling story is PGO capture plus the journal protocol
(Makefile:7-10, PERFORMANCE.md:5-33). The TPU equivalent here:

- :func:`trace`: context manager around ``jax.profiler.trace`` writing a
  TensorBoard-loadable XLA trace (``fqpack --profile DIR``, ``bench.py
  --profile DIR``).
- :class:`StageTimer`: lightweight accumulating wall-clock timer for
  pipeline stages, printed as a journal-ready table.
"""

from __future__ import annotations

import contextlib
import sys
import time
from collections import defaultdict


@contextlib.contextmanager
def trace(log_dir: str | None):
    """JAX profiler trace into ``log_dir`` (no-op when None)."""
    if not log_dir:
        yield
        return
    import jax

    with jax.profiler.trace(log_dir):
        yield
    print(f"profile trace written to {log_dir}", file=sys.stderr)


class StageTimer:
    """Accumulate wall-clock per named stage; print a summary table."""

    def __init__(self):
        self.totals: dict[str, float] = defaultdict(float)
        self.counts: dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def stage(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def report(self, out=None) -> None:
        out = out or sys.stderr
        total = sum(self.totals.values()) or 1.0
        print("stage timing:", file=out)
        for name, t in sorted(
            self.totals.items(), key=lambda kv: -kv[1]
        ):
            print(
                f"  {name:<24} {t:8.3f}s  {100 * t / total:5.1f}%  "
                f"x{self.counts[name]}",
                file=out,
            )
