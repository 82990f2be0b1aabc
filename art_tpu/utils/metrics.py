"""Timing + throughput metrics.

The reference's only instrumentation is a wall-clock print around the render
kernels (reference src/main.cu:699-712).  We keep the same stdout/stderr
contract (image -> stdout, diagnostics -> stderr) and add a Mrays/s metric:
rays = primary samples x average path length, measured from the integrator's
alive-count diagnostics.
"""

from __future__ import annotations

import sys
import time
from contextlib import contextmanager


@contextmanager
def wallclock(label: str, stream=sys.stderr):
    """Print elapsed seconds to stderr, like the reference 'took N seconds'."""
    start = time.perf_counter()
    try:
        yield
    finally:
        elapsed = time.perf_counter() - start
        print(f"{label} took {elapsed:.3f} seconds.", file=stream)


def mrays_per_sec(total_rays: float, seconds: float) -> float:
    return total_rays / seconds / 1e6
