"""Consistency proof (scheme 6): monotonic non-decreasing sequence.

Mirrors ``/root/reference/src/proof/consistency_proof.rs``.
"""

from __future__ import annotations

from typing import List

from ...utils.errors import InvalidInput
from ...utils.envelope import SCHEME_CONSISTENCY
from ...utils.validation import validate_consistency_params
from ..bulletproofs_backend import BulletproofsBackend
from .common import (
    create_proof,
    extract_bulletproofs_components,
    parse_and_validate_proof,
    reconstruct_bulletproofs_proof,
)

SCHEME_ID = SCHEME_CONSISTENCY


def prove_consistency_batch(datas) -> list:
    """Batched variant over sequences (lockstep IPP — see
    range_proof.prove_range_batch)."""
    from ..bulletproofs import prove_single_batch

    datas = [list(d) for d in datas]
    for data in datas:
        validate_consistency_params(data)
    prepared = []
    try:
        for data in datas:
            prepared.append(BulletproofsBackend.prepare_consistency(data))
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


def prove_consistency(data: List[int]) -> bytes:
    validate_consistency_params(data)
    try:
        backend_proof = BulletproofsBackend.prove_consistency(list(data))
    except ValueError as e:
        raise InvalidInput(str(e)) from None
    proof_bytes, commitment = extract_bulletproofs_components(backend_proof)
    return create_proof(SCHEME_ID, proof_bytes, commitment)


def verify_consistency(proof: bytes) -> bool:
    try:
        p = parse_and_validate_proof(proof, SCHEME_ID)
    except Exception:
        return False
    backend_proof = reconstruct_bulletproofs_proof(p.proof, p.commitment)
    return BulletproofsBackend.verify_consistency(backend_proof)
