"""Profiling helpers — the tracing subsystem the reference lacks.

The reference's only observability is hand-placed wall-clock pairs
(``detect.py:151-170``, ``ncnn::get_current_time()`` in ``YOLO_ncnn.cpp``;
SURVEY.md §5).  Here:

* :func:`trace` — context manager around ``jax.profiler.trace`` producing a
  TensorBoard-loadable XPlane trace of device execution;
* :class:`SectionTimer` — reference-style segmented wall-clock timing
  (infer vs postprocess vs ...) with an aggregate report, for quick
  host-side numbers without the profiler.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, Iterator


@contextlib.contextmanager
def trace(log_dir: str) -> Iterator[None]:
    """Capture a device profile into ``log_dir`` (view with TensorBoard's
    profile plugin or xprof)."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class SectionTimer:
    """Accumulating section timer.

    >>> t = SectionTimer()
    >>> with t.section("infer"): run_model()
    >>> with t.section("post"): postprocess()
    >>> t.report()   # {'infer': {'total_ms': ..., 'count': ..., 'avg_ms': ...}}
    """

    def __init__(self):
        self._total = defaultdict(float)
        self._count = defaultdict(int)

    @contextlib.contextmanager
    def section(self, name: str) -> Iterator[None]:
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self._total[name] += (time.perf_counter() - t0) * 1e3
            self._count[name] += 1

    def report(self) -> Dict[str, Dict[str, float]]:
        return {
            k: {
                "total_ms": round(self._total[k], 3),
                "count": self._count[k],
                "avg_ms": round(self._total[k] / max(self._count[k], 1), 3),
            }
            for k in self._total
        }
