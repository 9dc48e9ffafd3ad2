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

import atexit
import os
import shutil
import tempfile

import numpy as np

_SCRATCH: dict = {}

# driver-owned spill dirs (compiled graph blocks, broadcast COO arrays);
# removed atexit so RAM-backed /dev/shm is not starved across sessions
_SPILL_DIRS: list = []


def _register_spill_dir(path: str) -> None:
    if not _SPILL_DIRS:
        atexit.register(
            lambda: [shutil.rmtree(p, ignore_errors=True) for p in _SPILL_DIRS]
        )
    if path not in _SPILL_DIRS:
        _SPILL_DIRS.append(path)


def make_spill_dir(prefix: str) -> str:
    """A temp dir for worker-mmap'd graph arrays, owner pid embedded in the
    name. This process's dirs are removed atexit; dirs whose owner process
    is gone are swept here — atexit never runs on SIGKILL, and
    driver-terminated sessions otherwise starve the box's shared memory
    across runs."""
    base = "/dev/shm" if os.path.isdir("/dev/shm") else tempfile.gettempdir()
    _sweep_orphans(base, prefix)
    path = tempfile.mkdtemp(prefix=f"{prefix}{os.getpid()}_", dir=base)
    _register_spill_dir(path)
    return path


def _sweep_orphans(base: str, prefix: str) -> None:
    if not os.path.isdir("/proc"):  # liveness check is /proc-based
        return
    try:
        names = os.listdir(base)
    except OSError:
        return
    for name in names:
        if not name.startswith(prefix):
            continue
        pid_part = name[len(prefix):].split("_", 1)[0]
        # dirs from the pre-pid naming scheme can't be liveness-checked;
        # leave them to their own atexit
        if pid_part.isdigit() and not os.path.exists(f"/proc/{pid_part}"):
            shutil.rmtree(os.path.join(base, name), ignore_errors=True)


def release_spill_dir(path: str) -> None:
    """Remove a spill dir eagerly (instead of at exit) and drop it from the
    atexit registry — for owners whose lifecycle ends mid-session (e.g. a
    recompiled BlockGraph)."""
    shutil.rmtree(path, ignore_errors=True)
    try:
        _SPILL_DIRS.remove(path)
    except ValueError:
        pass


def scratch(key: tuple, shape: tuple, dtype=np.float64) -> np.ndarray:
    """A reusable ndarray of ``shape``/``dtype`` for ``key``. Contents are
    UNDEFINED — callers overwrite (fill/copyto/out=) before reading."""
    buf = _SCRATCH.get(key)
    need = int(np.prod(shape))
    if buf is None or buf.size < need or buf.dtype != np.dtype(dtype):
        buf = np.empty(need, dtype=dtype)
        _SCRATCH[key] = buf
    return buf[:need].reshape(shape)
