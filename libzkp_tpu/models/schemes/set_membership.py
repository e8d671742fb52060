"""Set-membership proof (scheme 4): value in set, value+index hidden.

Mirrors ``/root/reference/src/proof/set_membership.rs``: the set is embedded
in the payload as ``[u32 len][u64 x len]`` and compared order-insensitively at
verification (set_membership.rs:59-67).
"""

from __future__ import annotations

from typing import List

from ...utils.commitment import commit_value_snark
from ...utils.encoding import u32_le, u64_le
from ...utils.envelope import Proof, SCHEME_MEMBERSHIP
from ...utils.errors import ProofGenerationFailed
from ...utils.validation import validate_membership_params, validate_set_size
from ..snark_backend import MAX_SET_SIZE, SnarkBackend
from .common import (
    deserialize_embedded_set_prefix,
    parse_and_validate_proof,
    validate_standard_commitment,
)

SCHEME_ID = SCHEME_MEMBERSHIP


def prove_membership(value: int, the_set: List[int]) -> bytes:
    validate_membership_params(value, the_set)
    validate_set_size(the_set, MAX_SET_SIZE)
    commitment = commit_value_snark(value)
    snark_proof = SnarkBackend.prove_membership_zk(value, list(the_set), commitment)
    if not snark_proof:
        raise ProofGenerationFailed("SNARK membership proof generation failed")
    return _assemble(the_set, snark_proof, commitment)


def _assemble(the_set: List[int], snark_proof: bytes, commitment: bytes) -> bytes:
    payload = bytearray(u32_le(len(the_set)))
    for v in the_set:
        payload += u64_le(v)
    payload += snark_proof
    return Proof.new(SCHEME_ID, bytes(payload), commitment).to_bytes()


def prove_membership_batch(items) -> list:
    """Batched variant: proofs of the fixed membership circuit share each
    proving-key table walk (native OMP); per-proof fallback otherwise."""
    items = [(value, list(the_set)) for value, the_set in items]
    for value, the_set in items:
        validate_membership_params(value, the_set)
        validate_set_size(the_set, MAX_SET_SIZE)
    if len(items) >= 2:
        commitments = [commit_value_snark(v) for v, _ in items]
        entries = [(v, s, c) for (v, s), c in zip(items, commitments)]
        snarks = SnarkBackend.prove_membership_zk_many(entries)
        first = None
        if snarks is None:
            # seed circuit caches with one sequential proof, then batch
            first = prove_membership(*items[0])
            entries = entries[1:]
            snarks = SnarkBackend.prove_membership_zk_many(entries)
        if snarks is not None:
            out = [first] if first is not None else []
            for (v, s, c), sp in zip(entries, snarks):
                if not sp:
                    raise ProofGenerationFailed(
                        "SNARK membership proof generation failed"
                    )
                out.append(_assemble(s, sp, c))
            return out
        if first is not None:
            return [first] + [prove_membership(v, s) for v, s in items[1:]]
    return [prove_membership(v, s) for v, s in items]


def verify_membership(proof: bytes, the_set: List[int]) -> bool:
    try:
        p = parse_and_validate_proof(proof, SCHEME_ID)
        validate_standard_commitment(p.commitment)
    except Exception:
        return False
    parsed = deserialize_embedded_set_prefix(p.proof, MAX_SET_SIZE)
    if parsed is None:
        return False
    embedded_set, snark_bytes = parsed
    if not snark_bytes:
        return False
    if len(the_set) != len(embedded_set):
        return False
    if sorted(the_set) != sorted(embedded_set):
        return False
    return SnarkBackend.verify_membership_zk(snark_bytes, embedded_set, p.commitment)
