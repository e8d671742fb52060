"""Cross-scheme adversarial properties (SURVEY.md §4 implications):
truncation, byte-flip sweeps, wrong-scheme dispatch, wrong-version envelopes.
Verifiers must return False — never raise — on every one of these.
"""

from __future__ import annotations

import pytest

import libzkp_tpu.api as zkp
from libzkp_tpu.utils.envelope import Proof

SET = [10, 20, 25, 30, 40]


@pytest.fixture(scope="module")
def proofs():
    return {
        "range": zkp.prove_range(50, 0, 100),
        "equality": zkp.prove_equality(42, 42),
        "threshold": zkp.prove_threshold([10, 20, 30, 40], 50),
        "membership": zkp.prove_membership(25, SET),
        "improvement": zkp.prove_improvement(30, 50),
        "consistency": zkp.prove_consistency([10, 20, 30, 40, 50]),
    }


def _verify(kind: str, data: bytes) -> bool:
    return {
        "range": lambda d: zkp.verify_range(d, 0, 100),
        "equality": lambda d: zkp.verify_equality(d, 42, 42),
        "threshold": lambda d: zkp.verify_threshold(d, 50),
        "membership": lambda d: zkp.verify_membership(d, SET),
        "improvement": lambda d: zkp.verify_improvement(d, 30),
        "consistency": lambda d: zkp.verify_consistency(d),
    }[kind](data)


KINDS = ["range", "equality", "threshold", "membership", "improvement", "consistency"]


@pytest.mark.parametrize("kind", KINDS)
def test_roundtrip(proofs, kind):
    assert _verify(kind, proofs[kind])


@pytest.mark.parametrize("kind", KINDS)
def test_truncations_rejected(proofs, kind):
    p = proofs[kind]
    for cut in (0, 1, 4, len(p) // 2, len(p) - 1):
        assert _verify(kind, p[:cut]) is False, f"{kind} truncated at {cut} accepted"


@pytest.mark.parametrize("kind", KINDS)
def test_byte_flip_sweep_rejected(proofs, kind):
    p = proofs[kind]
    # flip a spread of positions: header, commitment region, proof body, tail
    positions = {0, 1, 2, 5, 9, len(p) // 4, len(p) // 2, (3 * len(p)) // 4, len(p) - 1}
    for pos in positions:
        b = bytearray(p)
        b[pos] ^= 0xFF
        assert _verify(kind, bytes(b)) is False, f"{kind} flip at {pos} accepted"


@pytest.mark.parametrize("kind", KINDS)
def test_wrong_scheme_dispatch_rejected(proofs, kind):
    """A valid proof of scheme A must fail every other scheme's verifier."""
    for other in KINDS:
        if other != kind:
            assert _verify(other, proofs[kind]) is False, f"{kind} passed {other}"


@pytest.mark.parametrize("kind", KINDS)
def test_wrong_version_rejected(proofs, kind):
    proof = Proof.from_bytes(proofs[kind])
    forged = bytes([proof.version + 1]) + proofs[kind][1:]
    assert _verify(kind, forged) is False


@pytest.mark.parametrize("kind", KINDS)
def test_garbage_rejected(kind):
    for junk in (b"", b"\x00", b"\xff" * 64, b"COMP" + b"\x00" * 40):
        assert _verify(kind, junk) is False


def test_composite_inner_tamper_rejected(proofs):
    comp = zkp.create_composite_proof([proofs["range"], proofs["improvement"]])
    assert zkp.verify_composite_proof(comp)
    b = bytearray(comp)
    b[len(b) // 2] ^= 0x01
    # reference parity: composite parsing propagates errors (TypeError via the
    # InvalidProofFormat mapping, composite.rs:28-31) rather than returning
    # False like the per-scheme verifiers
    try:
        assert zkp.verify_composite_proof(bytes(b)) is False
    except TypeError:
        pass


def test_membership_set_mismatch_rejected(proofs):
    assert zkp.verify_membership(proofs["membership"], [11, 20, 25, 30, 40]) is False
    # permuted set must still verify (order-insensitive, set_membership.rs:59-67)
    assert zkp.verify_membership(proofs["membership"], list(reversed(SET)))


def test_improvement_wrong_old_rejected(proofs):
    assert zkp.verify_improvement(proofs["improvement"], 31) is False
