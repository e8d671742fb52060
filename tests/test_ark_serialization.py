"""Arkworks `serialize_uncompressed` layout: G1/G2 point codecs (SWFlags in
the top bits of the last y byte), proof bytes, and ProvingKey/VerifyingKey
files (u64-LE vec lengths, arkworks field order — snark.rs:97-105), plus the
round-1 LZTK back-compat readers."""

import random

from libzkp_tpu.models import groth16
from libzkp_tpu.ops import bn254 as bn

random.seed(5150)


def _rand_g1():
    return bn.g1_scalar_mul(random.randrange(1, bn.R), bn.g1_from_affine(bn.G1_GEN))


def _rand_g2():
    return bn.g2_scalar_mul(
        random.randrange(1, bn.R), bn.g2_from_affine((bn.G2_GEN_X, bn.G2_GEN_Y))
    )


class TestPointCodec:
    def test_g1_roundtrip_and_flags(self):
        seen_neg = seen_pos = False
        for _ in range(8):
            p = _rand_g1()
            raw = groth16._g1_bytes(p)
            assert len(raw) == 64
            assert (raw[63] & 0x40) == 0
            got = groth16._g1_from(raw)
            assert bn.g1_to_affine(got) == bn.g1_to_affine(p)
            if raw[63] & 0x80:
                seen_neg = True
            else:
                seen_pos = True
            # readers must tolerate either sign-flag state (arkworks ignores
            # it on uncompressed reads; our writer may guess differently)
            flipped = bytearray(raw)
            flipped[63] ^= 0x80
            got2 = groth16._g1_from(bytes(flipped))
            assert bn.g1_to_affine(got2) == bn.g1_to_affine(p)
        assert seen_neg and seen_pos, "sign flag never varied across 8 points"

    def test_g1_infinity(self):
        raw = groth16._g1_bytes(bn.G1_INF)
        assert raw == b"\x00" * 63 + b"\x40"
        assert groth16._g1_from(raw) == bn.G1_INF
        # round-1 LZTK convention: all-zero, no flag
        assert groth16._g1_from(b"\x00" * 64) == bn.G1_INF
        # infinity flag with nonzero coordinates is malformed
        bad = bytearray(groth16._g1_bytes(_rand_g1()))
        bad[63] |= 0x40
        assert groth16._g1_from(bytes(bad)) is None

    def test_g2_roundtrip_and_infinity(self):
        p = _rand_g2()
        raw = groth16._g2_bytes(p)
        assert len(raw) == 128
        got = groth16._g2_from(raw)
        assert bn.g2_to_affine(got) == bn.g2_to_affine(p)
        flipped = bytearray(raw)
        flipped[127] ^= 0x80
        assert bn.g2_to_affine(groth16._g2_from(bytes(flipped))) == bn.g2_to_affine(p)
        assert groth16._g2_bytes(bn.G2_INF) == b"\x00" * 127 + b"\x40"
        assert groth16._g2_from(b"\x00" * 127 + b"\x40") == bn.G2_INF

    def test_off_curve_rejected(self):
        raw = bytearray(groth16._g1_bytes(_rand_g1()))
        raw[0] ^= 0x01
        assert groth16._g1_from(bytes(raw)) is None


class TestProofBytes:
    def test_proof_roundtrip_with_foreign_sign_flags(self):
        """A reference-produced proof may carry sign-flag bits on any of its
        three points; parsing must succeed regardless."""
        pf = groth16.Proof(a=_rand_g1(), b=_rand_g2(), c=_rand_g1())
        raw = bytearray(groth16.proof_to_bytes(pf))
        assert len(raw) == 256
        for off in (63, 191, 255):
            raw[off] ^= 0x80
        got = groth16.proof_from_bytes(bytes(raw))
        assert got is not None
        assert bn.g1_to_affine(got.a) == bn.g1_to_affine(pf.a)
        assert bn.g2_to_affine(got.b) == bn.g2_to_affine(pf.b)
        assert bn.g1_to_affine(got.c) == bn.g1_to_affine(pf.c)


class TestKeyFiles:
    @staticmethod
    def _toy_pk():
        vk = groth16.VerifyingKey(
            _rand_g1(), _rand_g2(), _rand_g2(), _rand_g2(), [_rand_g1(), _rand_g1()]
        )
        return groth16.ProvingKey(
            vk,
            _rand_g1(),
            _rand_g1(),
            [_rand_g1(), bn.G1_INF, _rand_g1()],  # a_query with infinity entry
            [bn.G1_INF, _rand_g1(), _rand_g1()],
            [_rand_g2(), bn.G2_INF, _rand_g2()],
            [_rand_g1()],
            [_rand_g1(), _rand_g1()],
        )

    def test_pk_roundtrip_arkworks_layout(self):
        pk = self._toy_pk()
        raw = groth16.pk_to_bytes(pk)
        # layout arithmetic: vk(64+3*128+8+2*64) + 2*64 + (8+3*64)*2 + (8+3*128) + (8+64) + (8+2*64)
        expected = (64 + 3 * 128 + 8 + 2 * 64) + 2 * 64 + 2 * (8 + 3 * 64) + (
            8 + 3 * 128
        ) + (8 + 1 * 64) + (8 + 2 * 64)
        assert len(raw) == expected
        got = groth16.pk_from_bytes(raw)
        assert got is not None
        assert groth16.pk_to_bytes(got) == raw
        assert len(got.a_query) == 3 and got.a_query[1] == bn.G1_INF

    def test_vk_roundtrip(self):
        pk = self._toy_pk()
        raw = groth16.vk_to_bytes(pk.vk)
        got = groth16.vk_from_bytes(raw)
        assert got is not None
        assert groth16.vk_to_bytes(got) == raw

    def test_truncated_rejected(self):
        raw = groth16.pk_to_bytes(self._toy_pk())
        assert groth16.pk_from_bytes(raw[:-1]) is None
        assert groth16.pk_from_bytes(raw + b"\x00") is None

    def test_real_setup_keys_roundtrip(self):
        """The actual equality-circuit setup must survive the key files."""
        from libzkp_tpu.models.snark_backend import _get_equality_setup

        pk = _get_equality_setup()
        pk2 = groth16.pk_from_bytes(groth16.pk_to_bytes(pk))
        assert pk2 is not None
        assert groth16.pk_to_bytes(pk2) == groth16.pk_to_bytes(pk)
        vk2 = groth16.vk_from_bytes(groth16.vk_to_bytes(pk.vk))
        assert groth16.vk_to_bytes(vk2) == groth16.vk_to_bytes(pk.vk)
