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

    # Phase 2 — Bulletproofs buckets: range, threshold and consistency ops
    # are FUSED into one lockstep pool — all their single-proof instances
    # advance together, so each IPP round is ONE native MSM batch over the
    # whole mixed bucket (fuller 8-lane groups, one OMP region, one warm
    # table walk) instead of three smaller per-scheme batches.
    bp_idx = [
        i
        for i, op in enumerate(items)
        if op.kind in ("range", "threshold", "consistency")
    ]
    if len(bp_idx) >= 2:
        from ..models.bulletproofs import prove_single_batch
        from ..models.bulletproofs_backend import BulletproofsBackend
        from ..models.schemes.common import (
            create_proof,
            extract_bulletproofs_components,
        )
        from ..utils.envelope import (
            SCHEME_CONSISTENCY,
            SCHEME_RANGE,
            SCHEME_THRESHOLD,
        )
        from ..utils.errors import BackendError, InvalidInput

        preps = []  # (result slot, scheme id, finish, instance count)
        instances = []
        for i in bp_idx:
            op = items[i]
            try:
                if op.kind == "range":
                    insts, fin = BulletproofsBackend.prepare_range_bits(
                        op.args[0], op.args[1], op.args[2], 64
                    )
                    sid = SCHEME_RANGE
                elif op.kind == "threshold":
                    insts, fin = BulletproofsBackend.prepare_threshold_bits(
                        list(op.args[0]), op.args[1], 64
                    )
                    sid = SCHEME_THRESHOLD
                else:
                    insts, fin = BulletproofsBackend.prepare_consistency(
                        list(op.args[0])
                    )
                    sid = SCHEME_CONSISTENCY
            except ValueError as e:
                # same exception classes the per-scheme batch fns raise
                if op.kind == "range":
                    raise BackendError(str(e)) from None
                raise InvalidInput(str(e)) from None
            preps.append((i, sid, fin, len(insts)))
            instances.extend(insts)
        bp_results = prove_single_batch(instances)
        pos = 0
        for i, sid, fin, k in preps:
            backend_proof = fin(bp_results[pos : pos + k])
            pos += k
            proof_bytes, commitment = extract_bulletproofs_components(
                backend_proof
            )
            results[i] = create_proof(sid, proof_bytes, commitment)
        batched.update(bp_idx)

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
