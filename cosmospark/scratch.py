"""Per-process reusable numpy scratch buffers for Arrow-batch kernels.

Why this exists (r6, the image_pipeline bench reconciliation): glibc
returns large (> mmap threshold) allocations to the kernel on free, so
a mapInPandas kernel that builds fresh multi-MB temporaries re-faults
its pages on EVERY Arrow batch. Page-fault/zeroing bandwidth on shared
hosts is wildly phase-dependent — measured here: 20-55 MB/s during a
co-tenant phase vs ~6 GB/s steady, a 300× swing on the identical numpy
statement (first-touch 400 MB: 19.9 s, then 0.06 s from a reused
arena). That swing, multiplied by per-batch temporaries, is what moved
an UNCHANGED image_pipeline 3.5 s → 6.1 s across rounds while the
single-thread streaming probe read clean.

``scratch(slot, shape, dtype)`` hands back a view of a per-process
cached buffer, grown geometrically on demand: the fault cost is paid
once per (long-lived) python worker instead of once per batch, and
steady-state batches run at arena speed regardless of host phase.

Contract: a slot's content is valid only until the NEXT scratch() call
for the same slot from the same process — callers must fully overwrite
before reading and must not retain references across calls. Kernels
here use one slot per call site, so simultaneous live buffers never
alias.
"""

from __future__ import annotations

import numpy as np

_POOL: dict[str, np.ndarray] = {}


def scratch(slot: str, shape, dtype) -> np.ndarray:
    """A C-contiguous (shape, dtype) array backed by the per-process
    buffer cached under ``slot`` (uninitialized — caller overwrites)."""
    dt = np.dtype(dtype)
    need = int(np.prod(shape)) * dt.itemsize
    buf = _POOL.get(slot)
    if buf is None or buf.nbytes < need:
        cap = max(need, 2 * (buf.nbytes if buf is not None else 0))
        buf = np.empty(cap, dtype=np.uint8)
        _POOL[slot] = buf
    return buf[:need].view(dt).reshape(shape)


def matmul(a: np.ndarray, b: np.ndarray, slot: str) -> np.ndarray:
    """a @ b into a scratch output (both 2-D, C-order result)."""
    out = scratch(slot, (a.shape[0], b.shape[1]), np.result_type(a, b))
    return np.matmul(a, b, out=out)


def clear() -> None:
    """Release every cached buffer (tests / memory pressure)."""
    _POOL.clear()
