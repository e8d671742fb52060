"""Shared envelope parse/build helpers for the proof layer.

Mirrors the envelope-handling half of ``/root/reference/src/utils/proof_helpers.rs``
(the universal scheme-dispatch verifier lives in
:mod:`libzkp_tpu.models.schemes.dispatch` to avoid import cycles).
"""

from __future__ import annotations

from typing import List, Optional, Tuple

from ...utils.encoding import u32_le
from ...utils.envelope import PROOF_VERSION, Proof
from ...utils.errors import InvalidProofFormat
from ...utils.limits import (
    MAX_BULLETPROOFS_BACKEND_PROOF_BYTES,
    MAX_PROOF_TOTAL_BYTES,
)


def parse_and_validate_proof(proof_bytes: bytes, expected_scheme: int) -> Proof:
    """Common parsing/validation (proof_helpers.rs:11-35)."""
    if len(proof_bytes) > MAX_PROOF_TOTAL_BYTES:
        raise InvalidProofFormat(f"proof too large: max {MAX_PROOF_TOTAL_BYTES} bytes")
    proof = Proof.from_bytes(proof_bytes)
    if proof.version != PROOF_VERSION:
        raise InvalidProofFormat(
            f"unsupported proof version: expected {PROOF_VERSION}, got {proof.version}"
        )
    if proof.scheme != expected_scheme:
        raise InvalidProofFormat(
            f"wrong proof scheme: expected {expected_scheme}, got {proof.scheme}"
        )
    return proof


def extract_bulletproofs_components(backend_proof: bytes) -> Tuple[bytes, bytes]:
    """Unwrap ``[u32 len][body][u32=32][commit32]`` (proof_helpers.rs:39-86)."""
    if len(backend_proof) > MAX_BULLETPROOFS_BACKEND_PROOF_BYTES:
        raise InvalidProofFormat(
            f"backend proof too large: max {MAX_BULLETPROOFS_BACKEND_PROOF_BYTES} bytes"
        )
    if len(backend_proof) < 4 + 4 + 32:
        raise InvalidProofFormat("bulletproofs backend payload too short")
    plen = int.from_bytes(backend_proof[0:4], "little")
    proof_end = 4 + plen
    if len(backend_proof) < proof_end + 4 + 32:
        raise InvalidProofFormat("truncated bulletproofs backend payload")
    clen = int.from_bytes(backend_proof[proof_end : proof_end + 4], "little")
    if clen != 32:
        raise InvalidProofFormat("invalid commitment length (expected 32)")
    if len(backend_proof) != proof_end + 4 + 32:
        raise InvalidProofFormat("trailing bytes in bulletproofs backend payload")
    return backend_proof[4:proof_end], backend_proof[proof_end + 4 :]


def reconstruct_bulletproofs_proof(proof_bytes: bytes, commitment: bytes) -> bytes:
    """Inverse of :func:`extract_bulletproofs_components` (proof_helpers.rs:89-96)."""
    return u32_le(len(proof_bytes)) + bytes(proof_bytes) + u32_le(32) + bytes(commitment)


def create_proof(scheme_id: int, proof_bytes: bytes, commitment: bytes) -> bytes:
    return Proof.new(scheme_id, proof_bytes, commitment).to_bytes()


def deserialize_embedded_set_prefix(
    data: bytes, max_set_len: int
) -> Optional[Tuple[List[int], bytes]]:
    """Parse ``[u32 set_len][u64 x set_len]`` prefix (proof_helpers.rs:104-127)."""
    if len(data) < 4:
        return None
    set_size = int.from_bytes(data[0:4], "little")
    if set_size == 0 or set_size > max_set_len:
        return None
    needed = 4 + set_size * 8
    if len(data) <= needed:
        return None
    out = [
        int.from_bytes(data[4 + i * 8 : 12 + i * 8], "little") for i in range(set_size)
    ]
    return out, data[needed:]


def validate_standard_commitment(commitment: bytes) -> None:
    if len(commitment) != 32:
        raise InvalidProofFormat(
            f"invalid commitment size: expected 32 bytes, got {len(commitment)}"
        )
