"""Improvement proof (scheme 5): ``new > old`` via STARK.

Mirrors ``/root/reference/src/proof/improvement_proof.rs``: payload is
``[old:8 LE][new:8 LE][stark_bytes]`` with the SHA-256 improvement commitment
(commitment.rs:38-50) in the envelope.
"""

from __future__ import annotations

from ...utils.commitment import commit_improvement, validate_improvement_commitment
from ...utils.encoding import u64_le
from ...utils.envelope import Proof, SCHEME_IMPROVEMENT
from ...utils.errors import ProofGenerationFailed
from ...utils.validation import validate_improvement_params
from ..stark_backend import StarkBackend
from .common import parse_and_validate_proof

SCHEME_ID = SCHEME_IMPROVEMENT


def prove_improvement(old: int, new: int) -> bytes:
    validate_improvement_params(old, new)

    data = u64_le(old) + u64_le(new)
    stark_proof = StarkBackend.prove(data)
    if not stark_proof:
        raise ProofGenerationFailed("STARK proof generation failed")

    commitment = commit_improvement(old, new)
    # Prefix old/new for verification incl. composite cryptographic checks
    # (improvement_proof.rs:28-31).
    payload = u64_le(old) + u64_le(new) + stark_proof
    return Proof.new(SCHEME_ID, payload, commitment).to_bytes()


def prove_improvement_batch(pairs) -> list:
    """Batched variant: the STARK trace LDEs for the whole batch run as one
    device call (see stark_backend.prove_improvement_batch)."""
    from ..stark_backend import prove_improvement_batch as _backend_batch

    for old, new in pairs:
        validate_improvement_params(old, new)
    stark_proofs = _backend_batch(pairs)
    out = []
    for (old, new), sp in zip(pairs, stark_proofs):
        if not sp:
            raise ProofGenerationFailed("STARK proof generation failed")
        payload = u64_le(old) + u64_le(new) + sp
        out.append(Proof.new(SCHEME_ID, payload, commit_improvement(old, new)).to_bytes())
    return out


def verify_improvement(proof: bytes, old: int) -> bool:
    try:
        p = parse_and_validate_proof(proof, SCHEME_ID)
    except Exception:
        return False
    if len(p.proof) < 16:
        return False
    stored_old = int.from_bytes(p.proof[0:8], "little")
    if stored_old != old:
        return False
    new = int.from_bytes(p.proof[8:16], "little")
    try:
        validate_improvement_commitment(p.commitment, old, new)
    except Exception:
        return False
    data = u64_le(old) + u64_le(new)
    return StarkBackend.verify(p.proof[16:], data)
