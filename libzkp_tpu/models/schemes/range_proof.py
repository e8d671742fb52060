"""Range proof (scheme 1): min <= value <= max via two-sided Bulletproofs.

Mirrors ``/root/reference/src/proof/range_proof.rs``.
"""

from __future__ import annotations

from ...utils.errors import BackendError
from ...utils.envelope import SCHEME_RANGE
from ...utils.validation import validate_range_params
from ..bulletproofs_backend import BulletproofsBackend
from .common import (
    create_proof,
    extract_bulletproofs_components,
    parse_and_validate_proof,
    reconstruct_bulletproofs_proof,
    validate_standard_commitment,
)

SCHEME_ID = SCHEME_RANGE


def prove_range(value: int, min_v: int, max_v: int) -> bytes:
    return prove_range_with_bits(value, min_v, max_v, 64)


def prove_range_with_bits(value: int, min_v: int, max_v: int, n_bits: int) -> bytes:
    """Range proof with configurable bit-width (8 for values in [0,255])."""
    validate_range_params(value, min_v, max_v)
    try:
        backend_proof = BulletproofsBackend.prove_range_with_bounds_bits(
            value, min_v, max_v, n_bits
        )
    except ValueError as e:
        raise BackendError(str(e)) from None
    proof_bytes, commitment = extract_bulletproofs_components(backend_proof)
    return create_proof(SCHEME_ID, proof_bytes, commitment)


def prove_range_batch(triples) -> list:
    """Batched variant over ``(value, min_v, max_v)`` triples: the min/max
    sub-proofs of every operation advance in lockstep so each IPP round is
    one native MSM batch (models.bulletproofs.prove_single_batch)."""
    from ..bulletproofs import prove_single_batch

    triples = list(triples)
    for value, min_v, max_v in triples:
        validate_range_params(value, min_v, max_v)
    prepared = []
    try:
        for value, min_v, max_v in triples:
            prepared.append(
                BulletproofsBackend.prepare_range_bits(value, min_v, max_v, 64)
            )
    except ValueError as e:
        raise BackendError(str(e)) from None
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


def verify_range(proof: bytes, min_v: int, max_v: int) -> bool:
    if min_v > max_v:
        return False
    try:
        p = parse_and_validate_proof(proof, SCHEME_ID)
        validate_standard_commitment(p.commitment)
    except Exception:
        return False
    backend_proof = reconstruct_bulletproofs_proof(p.proof, p.commitment)
    return BulletproofsBackend.verify_range_with_bounds(backend_proof, min_v, max_v)
