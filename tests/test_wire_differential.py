"""Differential tests: clean-room second parsers vs the production wire codecs.

Extends the winterfell double-implementation discipline (tests/wf_parser2.py)
to the two remaining wire families (VERDICT r4 #4b):

* bulletproofs 672-byte `RangeProof` layout — `tests/bp_parser2.py` vs
  `libzkp_tpu/models/bulletproofs.py`
* arkworks uncompressed Groth16 proof/vk/pk — `tests/ark_parser2.py` vs
  `libzkp_tpu/models/groth16.py`

Each family gets: field-for-field parse agreement on real artifacts,
byte-exact re-serialization through both writers, and a randomized
byte-flip/truncation fuzz where both parsers must agree accept/reject
(and on all fields whenever both accept).
"""

from __future__ import annotations

import os
import random

import pytest

from libzkp_tpu.models import bulletproofs as bp
from libzkp_tpu.models import groth16
from libzkp_tpu.models.strobe import Transcript

import ark_parser2 as ark2
import bp_parser2 as bp2


# ---------------------------------------------------------------------------
# Bulletproofs RangeProof wire
# ---------------------------------------------------------------------------


def _make_range_proof(n: int = 64, value: int = 777) -> bytes:
    t = Transcript(b"libzkp_range_min")
    proof, _v = bp.prove_single(t, value, 123456789, n)
    return proof.to_bytes()


@pytest.fixture(scope="module")
def rp_bytes() -> bytes:
    return _make_range_proof()


def test_bp_layout_length(rp_bytes):
    # n=64 single proof: 6 IPP rounds -> 672 bytes (INTEROP.md item 1)
    assert len(rp_bytes) == 672


def test_bp_parse_agreement(rp_bytes):
    ours = bp.RangeProof.from_bytes(rp_bytes)
    theirs = bp2.parse_range_proof(rp_bytes)
    assert ours is not None and theirs is not None
    assert theirs.A == ours.A and theirs.S == ours.S
    assert theirs.T_1 == ours.T_1 and theirs.T_2 == ours.T_2
    assert theirs.t_x == ours.t_x
    assert theirs.t_x_blinding == ours.t_x_blinding
    assert theirs.e_blinding == ours.e_blinding
    assert theirs.L == ours.ipp.L_vec and theirs.R == ours.ipp.R_vec
    assert theirs.a == ours.ipp.a and theirs.b == ours.ipp.b


def test_bp_reserialize_bitexact(rp_bytes):
    theirs = bp2.parse_range_proof(rp_bytes)
    assert bp2.write_range_proof(theirs) == rp_bytes
    ours = bp.RangeProof.from_bytes(rp_bytes)
    assert ours.to_bytes() == rp_bytes


def test_bp_fuzz_byte_flips(rp_bytes):
    rng = random.Random(0xB9)
    for _ in range(300):
        mutated = bytearray(rp_bytes)
        i = rng.randrange(len(mutated))
        mutated[i] ^= 1 << rng.randrange(8)
        m = bytes(mutated)
        ours = bp.RangeProof.from_bytes(m)
        theirs = bp2.parse_range_proof(m)
        assert (ours is None) == (theirs is None), f"parsers disagree at byte {i}"
        if ours is not None:
            assert theirs.t_x == ours.t_x and theirs.a == ours.ipp.a
            assert theirs.A == ours.A and theirs.L == ours.ipp.L_vec


def test_bp_fuzz_truncation(rp_bytes):
    for cut in range(0, len(rp_bytes) + 16, 7):
        m = rp_bytes[:cut] if cut <= len(rp_bytes) else rp_bytes + b"\x00" * (cut - len(rp_bytes))
        ours = bp.RangeProof.from_bytes(m)
        theirs = bp2.parse_range_proof(m)
        assert (ours is None) == (theirs is None), f"length {len(m)}"


def test_bp_noncanonical_scalar_rejected(rp_bytes):
    # force t_x (offset 128) to l  (non-canonical): both reject
    bad = bytearray(rp_bytes)
    bad[128:160] = int(bp2.GROUP_ORDER).to_bytes(32, "little")
    assert bp.RangeProof.from_bytes(bytes(bad)) is None
    assert bp2.parse_range_proof(bytes(bad)) is None


# ---------------------------------------------------------------------------
# Arkworks Groth16 proof / key wire
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def g16_artifacts():
    from libzkp_tpu.models import snark_backend as sb
    from libzkp_tpu.utils.commitment import commit_value_snark

    pk = sb._get_equality_setup()
    vk = pk.vk
    com = commit_value_snark(42)
    proof_bytes = sb.SnarkBackend.prove_equality_zk(42, 42, com)
    assert proof_bytes, "prove failed"
    return (
        groth16.proof_to_bytes(groth16.proof_from_bytes(bytes(proof_bytes))),
        groth16.vk_to_bytes(vk),
        groth16.pk_to_bytes(pk),
    )


def _g1_eq(a2: ark2.G1A, a1) -> bool:
    import libzkp_tpu.ops.bn254 as bn

    aff = bn.g1_to_affine(a1)
    if aff is None:
        return a2.inf
    return (not a2.inf) and a2.x == aff[0] and a2.y == aff[1]


def _g2_eq(a2: ark2.G2A, a1) -> bool:
    import libzkp_tpu.ops.bn254 as bn

    aff = bn.g2_to_affine(a1)
    if aff is None:
        return a2.inf
    return (not a2.inf) and a2.x == tuple(aff[0]) and a2.y == tuple(aff[1])


def test_ark_proof_parse_agreement(g16_artifacts):
    pb, _, _ = g16_artifacts
    assert len(pb) == 256
    ours = groth16.proof_from_bytes(pb)
    theirs = ark2.parse_proof(pb)
    assert ours is not None and theirs is not None
    assert _g1_eq(theirs.a, ours.a)
    assert _g2_eq(theirs.b, ours.b)
    assert _g1_eq(theirs.c, ours.c)
    # byte-exact writers
    assert ark2.write_proof(theirs) == pb
    assert groth16.proof_to_bytes(ours) == pb


def test_ark_vk_parse_agreement(g16_artifacts):
    _, vkb, _ = g16_artifacts
    ours = groth16.vk_from_bytes(vkb)
    theirs = ark2.parse_vk(vkb)
    assert ours is not None and theirs is not None
    assert _g1_eq(theirs.alpha_g1, ours.alpha_g1)
    assert _g2_eq(theirs.beta_g2, ours.beta_g2)
    assert _g2_eq(theirs.gamma_g2, ours.gamma_g2)
    assert _g2_eq(theirs.delta_g2, ours.delta_g2)
    assert len(theirs.gamma_abc_g1) == len(ours.gamma_abc_g1)
    for a2, a1 in zip(theirs.gamma_abc_g1, ours.gamma_abc_g1):
        assert _g1_eq(a2, a1)
    assert ark2.write_vk(theirs) == vkb
    assert groth16.vk_to_bytes(ours) == vkb


def test_ark_pk_parse_agreement(g16_artifacts):
    _, _, pkb = g16_artifacts
    ours = groth16.pk_from_bytes(pkb)
    theirs = ark2.parse_pk(pkb)
    assert ours is not None and theirs is not None
    for name in ("a_query", "b_g1_query", "h_query", "l_query"):
        v2, v1 = getattr(theirs, name), getattr(ours, name)
        assert len(v2) == len(v1), name
        for a2, a1 in zip(v2, v1):
            assert _g1_eq(a2, a1), name
    assert len(theirs.b_g2_query) == len(ours.b_g2_query)
    for a2, a1 in zip(theirs.b_g2_query, ours.b_g2_query):
        assert _g2_eq(a2, a1)
    assert _g1_eq(theirs.beta_g1, ours.beta_g1)
    assert _g1_eq(theirs.delta_g1, ours.delta_g1)
    assert ark2.write_pk(theirs) == pkb
    assert groth16.pk_to_bytes(ours) == pkb


def test_ark_proof_fuzz_byte_flips(g16_artifacts):
    pb, _, _ = g16_artifacts
    rng = random.Random(0xA7)
    agree_accept = 0
    for _ in range(300):
        mutated = bytearray(pb)
        i = rng.randrange(len(mutated))
        mutated[i] ^= 1 << rng.randrange(8)
        m = bytes(mutated)
        ours = groth16.proof_from_bytes(m)
        theirs = ark2.parse_proof(m)
        assert (ours is None) == (theirs is None), f"parsers disagree at byte {i}"
        if ours is not None:
            agree_accept += 1
            assert _g1_eq(theirs.a, ours.a) and _g2_eq(theirs.b, ours.b)
    # flag-bit-only flips can keep the proof parseable; most flips reject
    assert agree_accept < 150


def test_ark_vk_fuzz_truncation(g16_artifacts):
    _, vkb, _ = g16_artifacts
    for cut in range(0, len(vkb), 31):
        m = vkb[:cut]
        assert (groth16.vk_from_bytes(m) is None) == (ark2.parse_vk(m) is None), cut
    # trailing garbage rejects in both
    m = vkb + b"\x01"
    assert groth16.vk_from_bytes(m) is None and ark2.parse_vk(m) is None
