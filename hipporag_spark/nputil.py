"""Worker-side reusable NumPy scratch buffers.

Arrow-batched kernels (PPR SpMV/combine, blocked KNN) run every task on
identically-shaped data. Allocating multi-10MB temporaries per call is pure
churn: glibc serves them via fresh ``mmap`` regions, so every call pays
first-touch page faults — and on virtualized hosts those faults can
intermittently run 10-100× slower than resident-memory access (measured on
this sandbox; cpu≈wall, invisible to guest fault counters). Steady-state
kernels must therefore touch only preallocated, already-resident memory.

Buffers live in a per-worker-process registry (Spark reuses Python workers
across tasks by default) keyed by caller-chosen tuples; a buffer is grown
when a larger shape is requested and sliced down otherwise.
"""

from __future__ import annotations

import numpy as np

_SCRATCH: dict = {}


def scratch(key: tuple, shape: tuple, dtype=np.float64) -> np.ndarray:
    """A reusable ndarray of ``shape``/``dtype`` for ``key``. Contents are
    UNDEFINED — callers overwrite (fill/copyto/out=) before reading."""
    buf = _SCRATCH.get(key)
    need = int(np.prod(shape))
    if buf is None or buf.size < need or buf.dtype != np.dtype(dtype):
        buf = np.empty(need, dtype=dtype)
        _SCRATCH[key] = buf
    return buf[:need].reshape(shape)
