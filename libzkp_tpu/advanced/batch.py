"""Batch registry + processing.

Mirrors ``/root/reference/src/advanced/batch.rs``: a process-global registry
of ``ProofBatch`` keyed by cryptographically random non-zero u64 ids; every
mutation re-persists when a store is configured; ``process_batch`` consumes
the batch (removes it and its file) and generates all proofs.

The rayon ``par_iter`` fan-out (batch.rs:123-131) maps to the sharded batch
prover (:mod:`libzkp_tpu.parallel.batch_prover`): operations are bucketed by
type and proven with TPU-vectorized kernels where available, falling back to
the host path per op.
"""

from __future__ import annotations

import os
import threading
from typing import Dict, List

from ..utils import validation
from ..utils.composition import BatchOperation, ProofBatch
from ..utils.errors import InvalidInput
from . import batch_store

_registry_lock = threading.Lock()
_registry: Dict[int, ProofBatch] = {}


def _allocate_batch_id() -> int:
    while True:
        bid = int.from_bytes(os.urandom(8), "little")
        if bid != 0 and bid not in _registry:
            return bid


def create_proof_batch() -> int:
    """New batch; returns its cryptographically random non-zero u64 id."""
    with _registry_lock:
        bid = _allocate_batch_id()
        _registry[bid] = ProofBatch()
        batch_store.persist_batch_if_configured(bid, _registry[bid])
    return bid


def _with_batch_mut(batch_id: int, fn) -> None:
    with _registry_lock:
        batch = _registry.get(batch_id)
        if batch is None:
            raise InvalidInput(f"Invalid batch ID: {batch_id}")
        fn(batch)
        batch_store.persist_batch_if_configured(batch_id, batch)


def batch_add_range_proof(batch_id: int, value: int, min_v: int, max_v: int) -> None:
    validation.validate_range_params(value, min_v, max_v)
    _with_batch_mut(batch_id, lambda b: b.add_range_proof(value, min_v, max_v))


def batch_add_equality_proof(batch_id: int, val1: int, val2: int) -> None:
    validation.validate_equality_params(val1, val2)
    _with_batch_mut(batch_id, lambda b: b.add_equality_proof(val1, val2))


def batch_add_threshold_proof(batch_id: int, values: List[int], threshold: int) -> None:
    validation.validate_threshold_params(values, threshold)
    _with_batch_mut(batch_id, lambda b: b.add_threshold_proof(values, threshold))


def batch_add_membership_proof(batch_id: int, value: int, the_set: List[int]) -> None:
    validation.validate_membership_params(value, the_set)
    _with_batch_mut(batch_id, lambda b: b.add_membership_proof(value, the_set))


def batch_add_improvement_proof(batch_id: int, old: int, new: int) -> None:
    validation.validate_improvement_params(old, new)
    _with_batch_mut(batch_id, lambda b: b.add_improvement_proof(old, new))


def batch_add_consistency_proof(batch_id: int, data: List[int]) -> None:
    validation.validate_consistency_params(data)
    _with_batch_mut(batch_id, lambda b: b.add_consistency_proof(data))


def process_batch_operation(op: BatchOperation) -> bytes:
    from ..models.schemes import (
        consistency_proof,
        equality_proof,
        improvement_proof,
        range_proof,
        set_membership,
        threshold_proof,
    )

    if op.kind == "range":
        return range_proof.prove_range(*op.args)
    if op.kind == "equality":
        return equality_proof.prove_equality(*op.args)
    if op.kind == "threshold":
        return threshold_proof.prove_threshold(*op.args)
    if op.kind == "membership":
        return set_membership.prove_membership(*op.args)
    if op.kind == "improvement":
        return improvement_proof.prove_improvement(*op.args)
    if op.kind == "consistency":
        return consistency_proof.prove_consistency(*op.args)
    raise InvalidInput(f"unknown batch operation: {op.kind}")


def process_batch(batch_id: int) -> List[bytes]:
    """Generate all proofs for the batch; the batch is CONSUMED (batch.rs:110-140).

    Failure of any single operation fails the whole batch.
    """
    with _registry_lock:
        batch = _registry.pop(batch_id, None)
    if batch is None:
        raise InvalidInput(f"Invalid batch ID: {batch_id}")
    batch_store.delete_batch_file_if_configured(batch_id)
    from ..parallel.batch_prover import process_operations

    return process_operations(batch.operations)


def get_batch_status(batch_id: int) -> Dict[str, int]:
    with _registry_lock:
        batch = _registry.get(batch_id)
        if batch is None:
            raise InvalidInput(f"Invalid batch ID: {batch_id}")
        ops = list(batch.operations)
    status = {"total_operations": len(ops)}
    for kind in BatchOperation.KINDS:
        status[f"{kind}_proofs"] = sum(1 for op in ops if op.kind == kind)
    return status


def clear_batch(batch_id: int) -> None:
    with _registry_lock:
        _registry.pop(batch_id, None)
    batch_store.delete_batch_file_if_configured(batch_id)


def open_batch_from_store(batch_id: int) -> None:
    """Load a batch from disk into this process registry (batch.rs:193-211)."""
    directory = batch_store._store_dir_required()
    with _registry_lock:
        if batch_id in _registry:
            raise InvalidInput(f"batch {batch_id} is already open in this process")
        batch = batch_store.read_batch_file(directory, batch_id)
        _registry[batch_id] = batch


def refresh_batch_from_store(batch_id: int) -> None:
    """Replace the in-memory batch with the on-disk contents (batch.rs:215-233)."""
    directory = batch_store._store_dir_required()
    with _registry_lock:
        if batch_id not in _registry:
            raise InvalidInput(f"batch {batch_id} is not loaded in this process")
        _registry[batch_id] = batch_store.read_batch_file(directory, batch_id)


def export_batch_to_file(batch_id: int, dest: str) -> None:
    with _registry_lock:
        batch = _registry.get(batch_id)
        if batch is None:
            raise InvalidInput(f"Invalid batch ID: {batch_id}")
        batch_store.export_proof_batch_to_path(batch, dest)


def import_batch_from_file(src: str) -> int:
    pb = batch_store.import_proof_batch_from_path(src)
    with _registry_lock:
        bid = _allocate_batch_id()
        _registry[bid] = pb
        batch_store.persist_batch_if_configured(bid, pb)
    return bid


def _reset_for_tests() -> None:
    with _registry_lock:
        _registry.clear()
