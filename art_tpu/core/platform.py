"""Backend gating for the TPU-only code paths.

``tpu_paths()`` is THE gate every TPU-only decision (Pallas kernels,
MXU flush, fused refill, compacted texture fetch, TPU tile planning)
consults.  ART_TPU_FORCE_PALLAS=1 makes it answer True on any backend —
for AOT cross-lowering (``jit(f).trace(...).lower(lowering_platforms=
('tpu',))`` in tests/test_mosaic_lowering.py) and Mosaic IR inspection
on CPU hosts.  The Mosaic kernels cannot EXECUTE off-TPU: the flag is
strictly for trace/lowering, never for running.
"""

from __future__ import annotations

import os

import jax


def tpu_paths() -> bool:
    """True when the TPU-only code paths should be traced."""
    if os.environ.get("ART_TPU_FORCE_PALLAS"):
        return True
    return jax.default_backend() == "tpu"
