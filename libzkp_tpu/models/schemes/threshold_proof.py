"""Threshold proof (scheme 3): sum(values) >= threshold.

Mirrors ``/root/reference/src/proof/threshold_proof.rs``.
"""

from __future__ import annotations

from typing import List

from ...utils.errors import InvalidInput
from ...utils.envelope import SCHEME_THRESHOLD
from ...utils.validation import validate_threshold_params
from ..bulletproofs_backend import BulletproofsBackend
from .common import (
    create_proof,
    extract_bulletproofs_components,
    parse_and_validate_proof,
    reconstruct_bulletproofs_proof,
    validate_standard_commitment,
)

SCHEME_ID = SCHEME_THRESHOLD


def prove_threshold_batch(pairs) -> list:
    """Batched variant over ``(values, threshold)`` pairs (lockstep IPP —
    see range_proof.prove_range_batch)."""
    from ..bulletproofs import prove_single_batch

    pairs = [(list(v), t) for v, t in pairs]
    for values, threshold in pairs:
        validate_threshold_params(values, threshold)
    prepared = []
    try:
        for values, threshold in pairs:
            prepared.append(
                BulletproofsBackend.prepare_threshold_bits(values, threshold, 64)
            )
    except ValueError as e:
        raise InvalidInput(str(e)) from None
    instances = [inst for insts, _ in prepared for inst in insts]
    results = prove_single_batch(instances)
    out = []
    pos = 0
    for insts, finish in prepared:
        backend_proof = finish(results[pos : pos + len(insts)])
        pos += len(insts)
        proof_bytes, commitment = extract_bulletproofs_components(backend_proof)
        out.append(create_proof(SCHEME_ID, proof_bytes, commitment))
    return out


def prove_threshold(values: List[int], threshold: int) -> bytes:
    return prove_threshold_with_bits(values, threshold, 64)


def prove_threshold_with_bits(values: List[int], threshold: int, n_bits: int) -> bytes:
    """Threshold proof; use 8-bit width when sum - threshold fits in [0, 255]."""
    validate_threshold_params(values, threshold)
    try:
        backend_proof = BulletproofsBackend.prove_threshold_bits(
            list(values), threshold, n_bits
        )
    except ValueError as e:
        raise InvalidInput(str(e)) from None
    proof_bytes, commitment = extract_bulletproofs_components(backend_proof)
    return create_proof(SCHEME_ID, proof_bytes, commitment)


def verify_threshold(proof: bytes, threshold: int) -> bool:
    try:
        p = parse_and_validate_proof(proof, SCHEME_ID)
        validate_standard_commitment(p.commitment)
    except Exception:
        return False
    backend_proof = reconstruct_bulletproofs_proof(p.proof, p.commitment)
    return BulletproofsBackend.verify_threshold(backend_proof, threshold)
