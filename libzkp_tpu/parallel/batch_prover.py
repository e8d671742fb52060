"""Sharded batch proof generation.

Replaces the reference's rayon ``par_iter`` over batch operations
(``/root/reference/src/advanced/batch.rs:123-131``). Strategy:

1. Bucket operations by proof type (pad/bucket, SURVEY.md §2.3).
2. Batch the TPU-friendly subcomputations across the bucket — today the
   MiMC-5 commitments for equality/membership ops run as one jitted batch on
   the accelerator (:func:`libzkp_tpu.ops.mimc.mimc_hash_batch`), sharded
   over the ``dp`` mesh axis.
3. Assemble each proof with the host tier, preserving input order; any
   single failure fails the whole batch (reference semantics).
"""

from __future__ import annotations

from typing import List, Sequence

from ..ops.mimc import mimc_hash_batch, prime_mimc_memo
from ..utils.composition import BatchOperation

# Threshold below which batching the commitments on-device is not worth the
# dispatch/compile overhead (compiles travel over the TPU tunnel).
_MIN_DEVICE_BATCH = 64


def _precompute_snark_commitments(ops: Sequence[BatchOperation]) -> None:
    """Batch all MiMC commitments needed by equality/membership ops on-device
    and prime the host memo, so each downstream prover's commitment lookup
    is a dict hit instead of a 110-round host hash."""
    values = sorted(
        {op.args[0] for op in ops if op.kind in ("equality", "membership")}
    )
    if len(values) < _MIN_DEVICE_BATCH:
        return
    prime_mimc_memo(values, mimc_hash_batch(values))


def process_operations(ops: Sequence[BatchOperation]) -> List[bytes]:
    """Prove every operation, in order. Raises on the first failure.

    Thread-parallel over operations: the hot proving work runs inside the
    native kernels (ctypes releases the GIL), so a thread pool is true
    multi-core parallelism — the host-tier analogue of rayon's par_iter
    (``batch.rs:123-131``); the ``dp`` mesh axis covers the TPU tier.
    """
    from ..advanced.batch import process_batch_operation

    # Batch the MiMC commitments for commitment-heavy workloads on-device.
    _precompute_snark_commitments(ops)
    items = list(ops)
    results: List[bytes] = [b""] * len(items)

    # Phase 1 — Groth16 buckets: all proofs of one fixed circuit run as
    # phase-batched MSMs over shared proving-key tables (native OMP spans
    # the cores with no GIL in the way). Runs before the thread pool so the
    # two parallel layers never fight over cores.
    eq_idx = [i for i, op in enumerate(items) if op.kind == "equality"]
    mem_idx = [i for i, op in enumerate(items) if op.kind == "membership"]
    batched: set = set()
    if len(eq_idx) >= 2:
        from ..models.schemes.equality_proof import prove_equality_batch

        for i, proof in zip(
            eq_idx, prove_equality_batch([items[i].args for i in eq_idx])
        ):
            results[i] = proof
        batched.update(eq_idx)
    if len(mem_idx) >= 2:
        from ..models.schemes.set_membership import prove_membership_batch

        for i, proof in zip(
            mem_idx, prove_membership_batch([items[i].args for i in mem_idx])
        ):
            results[i] = proof
        batched.update(mem_idx)

    # Phase 2 — Bulletproofs buckets: every op's single-proof instances
    # advance in lockstep, so each IPP round is ONE native MSM batch over
    # all proofs (OMP across the batch).
    if len([i for i in range(len(items)) if items[i].kind == "range"]) >= 2:
        from ..models.schemes.range_proof import prove_range_batch

        idxs = [i for i, op in enumerate(items) if op.kind == "range"]
        for i, proof in zip(idxs, prove_range_batch([items[i].args for i in idxs])):
            results[i] = proof
        batched.update(idxs)
    if len([i for i in range(len(items)) if items[i].kind == "threshold"]) >= 2:
        from ..models.schemes.threshold_proof import prove_threshold_batch

        idxs = [i for i, op in enumerate(items) if op.kind == "threshold"]
        for i, proof in zip(
            idxs, prove_threshold_batch([items[i].args for i in idxs])
        ):
            results[i] = proof
        batched.update(idxs)
    if len([i for i in range(len(items)) if items[i].kind == "consistency"]) >= 2:
        from ..models.schemes.consistency_proof import prove_consistency_batch

        idxs = [i for i, op in enumerate(items) if op.kind == "consistency"]
        for i, proof in zip(
            idxs, prove_consistency_batch([items[i].args[0] for i in idxs])
        ):
            results[i] = proof
        batched.update(idxs)

    # Phase 3 — leftovers on the thread pool (native-kernel bound), STARK
    # improvements inline on the main thread (Python-heavy; threading them
    # was measured slower under the GIL).
    threaded_idx = [
        i
        for i, op in enumerate(items)
        if op.kind != "improvement" and i not in batched
    ]
    inline_idx = [i for i, op in enumerate(items) if op.kind == "improvement"]

    def _run_improvements() -> None:
        # Large improvement groups: all trace LDEs in ONE device call.
        if len(inline_idx) >= 64:
            from ..models.schemes.improvement_proof import prove_improvement_batch

            pairs = [(items[i].args[0], items[i].args[1]) for i in inline_idx]
            for i, proof in zip(inline_idx, prove_improvement_batch(pairs)):
                results[i] = proof
        else:
            for i in inline_idx:
                results[i] = process_batch_operation(items[i])

    if len(threaded_idx) > 1:
        import os
        from concurrent.futures import ThreadPoolExecutor

        from ..utils import threads

        # Workers are marked as parallel-region threads so the per-proof
        # layers below (sub-proof pools, OpenMP MSM chunks) stay serial —
        # op-level parallelism owns the cores here (utils.threads).
        worker = threads.wrap_worker(process_batch_operation)
        workers = min(len(threaded_idx), os.cpu_count() or 2)
        with ThreadPoolExecutor(max_workers=workers) as pool:
            futs = {i: pool.submit(worker, items[i]) for i in threaded_idx}
            with threads.enter_parallel():
                _run_improvements()
            for i, f in futs.items():
                results[i] = f.result()
    else:
        _run_improvements()
        for i in threaded_idx:
            results[i] = process_batch_operation(items[i])
    return results
