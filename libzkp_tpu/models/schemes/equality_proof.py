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


def prove_equality_batch(pairs) -> list:
    """Batched variant: all proofs of the fixed equality circuit share each
    proving-key table walk (native OMP). Falls back to per-proof proving
    when the fast path is unavailable (e.g. cold circuit caches)."""
    pairs = list(pairs)
    for v1, v2 in pairs:
        validate_equality_params(v1, v2)
    if len(pairs) >= 2:
        commitments = [commit_value_snark(v1) for v1, _ in pairs]
        entries = [(v1, v2, c) for (v1, v2), c in zip(pairs, commitments)]
        snarks = SnarkBackend.prove_equality_zk_many(entries)
        if snarks is None:
            # seed circuit caches with one sequential proof, then batch
            first = prove_equality(*pairs[0])
            snarks = SnarkBackend.prove_equality_zk_many(entries[1:])
            if snarks is not None:
                out = [first]
                for (v1, v2, c), sp in zip(entries[1:], snarks):
                    if not sp:
                        raise ProofGenerationFailed("SNARK proof generation failed")
                    out.append(Proof.new(SCHEME_ID, sp, c).to_bytes())
                return out
        else:
            out = []
            for (v1, v2, c), sp in zip(entries, snarks):
                if not sp:
                    raise ProofGenerationFailed("SNARK proof generation failed")
                out.append(Proof.new(SCHEME_ID, sp, c).to_bytes())
            return out
    return [prove_equality(v1, v2) for v1, v2 in pairs]


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
