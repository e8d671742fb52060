"""Process-wide thread budget coordination.

The host tier has three potential layers of parallelism on the same cores:

1. batch-level: ``process_batch`` fans operations out over a thread pool
   (the rayon-par_iter replacement, reference ``batch.rs:123-131``);
2. intra-op: one proof's independent sub-computations (the min/max halves of
   a range proof, the five independent Groth16 MSMs) run on sibling threads;
3. intra-MSM: the native Pippenger/BGMW engines split bucket windows over
   OpenMP threads.

Nesting these oversubscribes small hosts and is *slower* than serial. The
rule enforced here: whichever layer claims the cores first wins, everything
below runs serial. Worker threads mark themselves inside a parallel region
with :func:`enter_parallel`; lower layers consult :func:`in_parallel_region`
(the native MSM wrappers do this automatically and drop to one OpenMP chunk).
"""

from __future__ import annotations

import os
import threading
from contextlib import contextmanager

_tls = threading.local()


def in_parallel_region() -> bool:
    """True when the current thread runs under a higher parallel layer."""
    return getattr(_tls, "depth", 0) > 0


@contextmanager
def enter_parallel():
    """Mark the current thread as living inside a parallel region."""
    _tls.depth = getattr(_tls, "depth", 0) + 1
    try:
        yield
    finally:
        _tls.depth -= 1


def wrap_worker(fn):
    """Wrap ``fn`` so pool workers are marked as parallel-region threads."""

    def run(*args, **kwargs):
        with enter_parallel():
            return fn(*args, **kwargs)

    return run


def intra_op_workers(want: int) -> int:
    """How many sibling threads an operation may spawn (1 = stay serial)."""
    if in_parallel_region():
        return 1
    return max(1, min(want, os.cpu_count() or 2))


def msm_chunks() -> int:
    """OpenMP window-chunk count for a native MSM issued by this thread:
    0 lets the engine pick (2 on multicore), 1 forces serial under a pool."""
    return 1 if in_parallel_region() else 0


def run_pair(f1, f2):
    """Run two independent thunks, on two threads when the budget allows.

    Returns ``(f1(), f2())``. Serial when already inside a parallel region
    (nested pools oversubscribe); otherwise ``f1`` goes to a worker thread
    and ``f2`` runs inline, both marked parallel so their native MSMs stay
    single-chunk.
    """
    if in_parallel_region() or (os.cpu_count() or 1) < 2:
        return f1(), f2()
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=1) as pool:
        fut = pool.submit(wrap_worker(f1))
        with enter_parallel():
            r2 = f2()
        return fut.result(), r2


def run_many(fn, args_seq):
    """Map ``fn`` over ``args_seq`` (single-argument), pooled when allowed.

    Preserves order. Serial inside a parallel region or for < 2 items.
    """
    items = list(args_seq)
    workers = intra_op_workers(len(items))
    if workers < 2 or len(items) < 2:
        return [fn(a) for a in items]
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=workers) as pool:
        return list(pool.map(wrap_worker(fn), items))
