"""Equality proof (scheme 2): Groth16 + MiMC commitment binding.

Mirrors ``/root/reference/src/proof/equality_proof.rs``.
"""

from __future__ import annotations

from ...utils.commitment import commit_value_snark
from ...utils.envelope import Proof, SCHEME_EQUALITY
from ...utils.errors import ProofGenerationFailed
from ...utils.validation import validate_equality_params
from ..snark_backend import SnarkBackend
from .common import parse_and_validate_proof, validate_standard_commitment

SCHEME_ID = SCHEME_EQUALITY


def prove_equality(val1: int, val2: int) -> bytes:
    validate_equality_params(val1, val2)
    commitment = commit_value_snark(val1)
    snark_proof = SnarkBackend.prove_equality_zk(val1, val2, commitment)
    if not snark_proof:
        raise ProofGenerationFailed("SNARK proof generation failed")
    return Proof.new(SCHEME_ID, snark_proof, commitment).to_bytes()


def _verify_equality_inner(proof: bytes, expected_commitment: bytes) -> bool:
    try:
        p = parse_and_validate_proof(proof, SCHEME_ID)
        validate_standard_commitment(expected_commitment)
    except Exception:
        return False
    if p.commitment != bytes(expected_commitment):
        return False
    return SnarkBackend.verify_equality_zk(p.proof, expected_commitment)


def verify_equality(proof: bytes, val1: int, val2: int) -> bool:
    if val1 != val2:
        return False
    return _verify_equality_inner(proof, commit_value_snark(val1))


def verify_equality_with_commitment(proof: bytes, expected_commitment: bytes) -> bool:
    return _verify_equality_inner(proof, bytes(expected_commitment))
