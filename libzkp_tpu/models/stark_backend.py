"""STARK backend: improvement proofs (new > old).

Mirrors the reference's winterfell backend (``/root/reference/src/backend/stark.rs``):

* ``ImprovementAir`` — 1 column x 8 rows linear-interpolation trace, one
  degree-1 transition constraint ``next - current - step`` (stark.rs:63-76)
  and two boundary assertions (first=old, last=new, stark.rs:78-83).
* ``step = (new - old) / (trace_length - 1)`` computed in f128
  (stark.rs:160-175), so the trace interpolates exactly.
* Byte interface: ``prove(data)`` takes ``[old:8 LE][new:8 LE]`` and
  ``verify(proof, data)`` the same, per the ``ZkpBackend`` impl
  (stark.rs:215-252).
"""

from __future__ import annotations

from typing import List, Tuple

from ..ops.field import F128
from ..utils.encoding import read_u64_le
from . import stark


class ImprovementAir(stark.Air):
    """Linear interpolation from ``old`` to ``new`` over the trace."""

    field = F128

    def __init__(self, trace_length: int, pub_inputs, options: stark.ProofOptions):
        assert len(pub_inputs) == 2
        super().__init__(trace_length, 1, pub_inputs, options)
        F = self.field
        old_v, new_v = self.pub_inputs
        diff = F.sub(new_v % F.p, old_v % F.p)
        steps = (trace_length - 1) % F.p
        self.step_size = F.div(diff, steps)

    def transition_degrees(self) -> List[int]:
        return [1]

    def evaluate_transition(self, current: List[int], nxt: List[int]) -> List[int]:
        F = self.field
        # next = current + step  <=>  next - current - step == 0
        return [F.sub(F.sub(nxt[0], current[0]), self.step_size)]

    def get_assertions(self) -> List[Tuple[int, int, int]]:
        return [
            (0, 0, self.pub_inputs[0] % self.field.p),
            (0, self.trace_length - 1, self.pub_inputs[1] % self.field.p),
        ]


TRACE_LENGTH = 8  # stark.rs:157

DEFAULT_OPTIONS = stark.ProofOptions(
    num_queries=32, blowup=8, grinding=0, folding=8, max_remainder_degree=31
)


def _use_native_stark() -> bool:
    from .. import native

    return native.HAVE_NATIVE and not _os.environ.get("LIBZKP_NO_NATIVE_STARK")


def _prove_native(pairs) -> List[bytes]:
    """Whole-pipeline native prover (zkpcore.cpp stark_improve_one), OMP
    across pairs; byte-exact vs the Python pipeline (tests/test_stark.py)."""
    from .. import native

    ctxs = [
        ImprovementAir(TRACE_LENGTH, [o, n], DEFAULT_OPTIONS).context_bytes()
        for o, n in pairs
    ]
    return native.stark_prove_improvement_batch(
        pairs, F128.p, F128.root_of_unity(TRACE_LENGTH * DEFAULT_OPTIONS.blowup),
        ctxs,
    )


def prove_improvement(old: int, new: int) -> bytes:
    """Generate a STARK proof that ``new > old`` (stark.rs:151-186)."""
    if new <= old:
        raise ValueError("new value must be greater than old value")
    if _use_native_stark():
        return _prove_native([(old, new)])[0]
    F = F128
    air = ImprovementAir(TRACE_LENGTH, [old, new], DEFAULT_OPTIONS)
    # Build the trace: t[0]=old, t[i+1]=t[i]+step (exact linear interpolation).
    col = []
    cur = old % F.p
    for i in range(TRACE_LENGTH):
        col.append(cur)
        if i < TRACE_LENGTH - 1:
            cur = F.add(cur, air.step_size)
    assert col[-1] == new % F.p
    return stark.prove(air, [col])


def _build_trace(air: ImprovementAir, old: int) -> List[int]:
    F = F128
    col = []
    cur = old % F.p
    for i in range(TRACE_LENGTH):
        col.append(cur)
        if i < TRACE_LENGTH - 1:
            cur = F.add(cur, air.step_size)
    return col


# Below this batch size the device round-trip outweighs the host NTTs.
# The first device call per process also pays a one-time XLA compile, which
# is seconds on a locally attached TPU but can be minutes over a remote
# tunnel — so the default is conservative; persistent TPU deployments should
# lower LIBZKP_DEVICE_LDE_MIN (e.g. to 64) to engage the device path sooner.
import os as _os

_MIN_DEVICE_LDE_BATCH = int(_os.environ.get("LIBZKP_DEVICE_LDE_MIN", "256"))


_fork_pool = None


def _get_fork_pool():
    """Lazy 2+-process fork pool for the GIL-bound STARK host pipeline.

    STARK improvement proofs are deterministic and independent, and the
    prover is ~50% pure Python, so threads cannot scale it (measured 0.56x)
    but forked processes reach ~1.9x on 2 cores. Workers never touch
    jax/the device. None when unavailable (single core, fork unsupported,
    or LIBZKP_NO_FORK set)."""
    global _fork_pool
    if _os.environ.get("LIBZKP_NO_FORK"):
        return None
    workers = _os.cpu_count() or 1
    if workers < 2:
        return None
    if _fork_pool is False:  # previous creation attempt wedged; stay serial
        return None
    if _fork_pool is None:
        try:
            import atexit
            import multiprocessing as mp
            from concurrent.futures import ProcessPoolExecutor

            pool = ProcessPoolExecutor(
                max_workers=workers, mp_context=mp.get_context("fork")
            )
            # Fork the workers NOW and prove they are alive: forking a
            # process with live XLA threads can deadlock the child, and an
            # except-clause cannot catch a hang. A bounded health check at
            # creation converts "wedged batch" into "serial fallback".
            futs = [pool.submit(int, i) for i in range(workers)]
            for f in futs:
                f.result(timeout=10)
            # shut down before interpreter teardown tears out the modules the
            # pool's weakref callbacks touch (noisy traceback otherwise)
            atexit.register(pool.shutdown, wait=False, cancel_futures=True)
            _fork_pool = pool
        except Exception:
            try:
                pool.shutdown(wait=False, cancel_futures=True)
            except Exception:
                pass
            _fork_pool = False
            return None
    return _fork_pool


def _prove_pairs_host(pairs) -> List[bytes]:
    out = []
    for old, new in pairs:
        air = ImprovementAir(TRACE_LENGTH, [old, new], DEFAULT_OPTIONS)
        out.append(stark.prove(air, [_build_trace(air, old)]))
    return out


def _prove_precomputed(work) -> List[bytes]:
    """Fork-pool worker: host pipeline over device-precomputed LDEs.

    ``work``: list of ((old, new), trace_col, poly, lde[, leaves]) tuples."""
    out = []
    for item in work:
        (old, new), col, poly, lde = item[:4]
        air = ImprovementAir(TRACE_LENGTH, [old, new], DEFAULT_OPTIONS)
        pre = ([poly], [lde], item[4]) if len(item) > 4 else ([poly], [lde])
        out.append(stark.prove(air, [col], precomputed=pre))
    return out


def prove_improvement_batch(pairs) -> List[bytes]:
    """Batch prover: for large batches either the device path (all trace
    interpolations + coset LDEs as ONE jitted call sharded over ``dp``) or
    the forked host path (process-parallel across cores); per-proof
    transcript/Merkle/FRI assembly stays on the host (SURVEY.md §2.3)."""
    for old, new in pairs:
        if new <= old:
            raise ValueError("new value must be greater than old value")
    # Fast path: the whole pipeline in one native call, OMP across pairs —
    # measured ~5x the forked-host and device-LDE paths at every batch size.
    if _use_native_stark():
        return _prove_native(list(pairs))
    airs, cols = [], []
    for old, new in pairs:
        air = ImprovementAir(TRACE_LENGTH, [old, new], DEFAULT_OPTIONS)
        airs.append(air)
        cols.append(_build_trace(air, old))
    if len(pairs) >= _MIN_DEVICE_LDE_BATCH:
        # Fork the pool BEFORE this call dispatches to JAX: forking with
        # live XLA threads in the parent is a deadlock hazard (the pool
        # health-checks its workers either way).
        pool = _get_fork_pool()
        if _os.environ.get("LIBZKP_DEVICE_COMMIT", "1") != "0":
            # fused device program: LDE + canonical pack + BLAKE3 leaf
            # digests in one dispatch (ops/stark_device.py); the host
            # pipeline then skips hash_element_rows for the trace tree
            from ..ops.stark_device import coset_lde_commit_batch

            polys, ldes, leaf_rows = coset_lde_commit_batch(
                F128.p, cols, DEFAULT_OPTIONS.blowup, stark.DOMAIN_OFFSET
            )
        else:
            from ..ops.ntt import coset_lde_batch

            polys, ldes = coset_lde_batch(
                F128.p, cols, DEFAULT_OPTIONS.blowup, stark.DOMAIN_OFFSET
            )
            leaf_rows = None
        # Per-proof transcript/Merkle/FRI assembly is GIL-bound Python: fan
        # it out over the fork pool (the device already did the LDE math).
        if pool is not None:
            try:
                nw = pool._max_workers
                work = (
                    list(zip(pairs, cols, polys, ldes, leaf_rows))
                    if leaf_rows is not None
                    else list(zip(pairs, cols, polys, ldes))
                )
                chunks = [work[i::nw] for i in range(nw)]
                parts = list(pool.map(_prove_precomputed, chunks))
                out: List[bytes] = [b""] * len(pairs)
                for w, part in enumerate(parts):
                    for j, proof in enumerate(part):
                        out[w + j * nw] = proof
                return out
            except Exception:
                pass  # fall through to the serial assembly path
        if leaf_rows is not None:
            return [
                stark.prove(air, [col], precomputed=([poly], [lde], leaves))
                for air, col, poly, lde, leaves in zip(
                    airs, cols, polys, ldes, leaf_rows
                )
            ]
        return [
            stark.prove(air, [col], precomputed=([poly], [lde]))
            for air, col, poly, lde in zip(airs, cols, polys, ldes)
        ]
    if len(pairs) >= 64:
        pool = _get_fork_pool()
        if pool is not None:
            try:
                nw = pool._max_workers
                chunks = [list(pairs[i::nw]) for i in range(nw)]
                parts = list(pool.map(_prove_pairs_host, chunks))
                out: List[bytes] = [b""] * len(pairs)
                for w, part in enumerate(parts):
                    for j, proof in enumerate(part):
                        out[w + j * nw] = proof
                return out
            except Exception:
                pass  # fall through to the serial host path
    return [stark.prove(air, [col]) for air, col in zip(airs, cols)]


def verify_improvement(proof_bytes: bytes, old: int, new: int) -> bool:
    """Verify with public inputs [old, new] (stark.rs:188-212). Never raises."""
    try:
        air = ImprovementAir(TRACE_LENGTH, [old, new], DEFAULT_OPTIONS)
    except Exception:
        return False
    if _use_native_stark():
        try:
            from .. import native

            return native.stark_verify_improvement(
                old, new, F128.p,
                F128.root_of_unity(TRACE_LENGTH * DEFAULT_OPTIONS.blowup),
                air.context_bytes(), bytes(proof_bytes),
            )
        except Exception:
            return False
    return stark.verify(air, proof_bytes)


class StarkBackend:
    """Byte-oriented ZkpBackend interface (stark.rs:215-252)."""

    @staticmethod
    def prove(data: bytes) -> bytes:
        if len(data) != 16:
            return b""
        old = read_u64_le(data, 0)
        new = read_u64_le(data, 8)
        if old is None or new is None:
            return b""
        try:
            return prove_improvement(old, new)
        except Exception:
            return b""

    @staticmethod
    def verify(proof: bytes, data: bytes) -> bool:
        if len(data) != 16:
            return False
        old = read_u64_le(data, 0)
        new = read_u64_le(data, 8)
        if old is None or new is None:
            return False
        return verify_improvement(proof, old, new)
