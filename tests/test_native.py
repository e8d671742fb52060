"""Differential tests: native C++ kernels vs the pure-Python golden models.

The native tier (``libzkp_tpu/native/zkpcore.cpp``) re-implements the
host-side crypto the reference gets from compiled Rust crates (blake3,
keccak-f1600, curve25519 group ops — SURVEY.md §2.2).  Every routine must
agree bit-for-bit with the Python golden models in ``libzkp_tpu.ops``.
"""

from __future__ import annotations

import random

import pytest

from libzkp_tpu import native
from libzkp_tpu.ops import ed25519 as ed
from libzkp_tpu.ops.blake3 import blake3_256_py
from libzkp_tpu.ops.keccak import keccak_f1600_bytes_py

pytestmark = pytest.mark.skipif(
    not native.HAVE_NATIVE, reason="native kernel not built (no g++?)"
)

rng = random.Random(0xC0FFEE)


def _rand_bytes(n: int) -> bytes:
    return bytes(rng.getrandbits(8) for _ in range(n))


def _rand_point() -> ed.Point:
    return ed.scalar_mul_py(rng.randrange(1, ed.L), ed.BASEPOINT)


def test_blake3_matches_python():
    for n in (0, 1, 31, 32, 63, 64, 65, 512, 1023, 1024, 1025, 2048, 5000):
        data = _rand_bytes(n)
        assert native.blake3_256(data) == blake3_256_py(data)


def test_blake3_batch_and_merkle_levels():
    leaves = [_rand_bytes(32) for _ in range(8)]
    assert native.blake3_batch(leaves, 32) == [blake3_256_py(l) for l in leaves]
    levels = native.blake3_merkle_levels(leaves)
    assert len(levels) == 3
    expect = leaves
    for lvl in levels:
        expect = [blake3_256_py(expect[i] + expect[i + 1]) for i in range(0, len(expect), 2)]
        assert lvl == expect
    assert len(levels[-1]) == 1


def test_keccak_matches_python():
    state = bytearray(_rand_bytes(200))
    ref = bytearray(state)
    native.keccak_f1600_bytes(state)
    keccak_f1600_bytes_py(ref)
    assert bytes(state) == bytes(ref)


def test_point_ops_match_python():
    p, q = _rand_point(), _rand_point()
    assert ed.point_equal(native.ed_point_add(p, q), ed.point_add(p, q))
    for _ in range(4):
        k = rng.randrange(0, ed.L)
        assert ed.point_equal(native.ed_scalar_mul(k, p, ed.L), ed.scalar_mul_py(k, p))
    assert ed.point_equal(native.ed_scalar_mul(0, p, ed.L), ed.IDENTITY)


@pytest.mark.parametrize("n", [1, 2, 7, 33, 130])
def test_msm_matches_python(n):
    pts = [_rand_point() for _ in range(n)]
    ks = [rng.randrange(0, ed.L) for _ in range(n)]
    assert ed.point_equal(native.ed_msm(ks, pts, ed.L), ed.msm_py(ks, pts))


def test_ristretto_roundtrip_matches_python():
    for _ in range(8):
        pt = _rand_point()
        enc = native.ristretto_compress(pt)
        assert enc == ed.compress_py(pt)
        dec = native.ristretto_decompress(enc)
        assert dec is not None
        assert ed.ristretto_eq(dec, ed.decompress_py(enc))
    # rejections: negative s, non-canonical, bad length
    assert native.ristretto_decompress(b"\x01" + b"\x00" * 31) is None
    assert native.ristretto_decompress(b"\xff" * 32) is None
    assert native.ristretto_decompress(b"\x00" * 16) is None


def test_wired_into_ops_layer():
    """When native is available the ops-module entry points must be routed."""
    data = b"wired-check"
    from libzkp_tpu.ops import blake3 as b3mod

    assert b3mod.blake3_256(data) == blake3_256_py(data)
    pt = _rand_point()
    assert ed.compress(pt) == ed.compress_py(pt)
    assert ed.point_equal(ed.msm([3, 5], [pt, ed.BASEPOINT]), ed.msm_py([3, 5], [pt, ed.BASEPOINT]))


def test_ntt_matches_python():
    from libzkp_tpu.ops.field import BN254_FR, F128
    from libzkp_tpu.ops.ntt import ntt, ntt_py

    for F in (BN254_FR, F128):
        for n in (2, 8, 64, 256):
            vals = [rng.randrange(F.p) for _ in range(n)]
            assert ntt(F, vals) == ntt_py(F, vals)
            assert ntt(F, vals, invert=True) == ntt_py(F, vals, invert=True)
            assert ntt(F, ntt(F, vals), invert=True) == [v % F.p for v in vals]


# ---------------------------------------------------------------------------
# second-session round-3 kernels: IFMA complete-addition fixed MSMs, batched
# Pedersen compression, pairing final-exponentiation chain
# ---------------------------------------------------------------------------


def test_bn254_fixed_msm_adversarial_scalars():
    """The 8-lane complete-addition kernel (zkpcore fixed_msm_ca_range) must
    match the Python golden model on scalar patterns that force bucket
    doubling/cancellation edge paths: all-equal, 0/1, tiny, and boundary
    scalars. (Branchless complete adds make these flow through the same
    arithmetic — this pins that claim.)"""
    from libzkp_tpu.ops import bn254 as bn

    k = 21
    g = bn.g1_from_affine(bn.G1_GEN)
    pts = [bn.g1_scalar_mul(rng.randrange(1, bn.R), g) for _ in range(k)]
    patterns = [
        [7] * k,                                   # identical small scalars
        [i % 2 for i in range(k)],                 # 0/1 witness-like vector
        [0] * (k - 1) + [bn.R - 1],                # sparse + boundary
        [rng.randrange(bn.R) for _ in range(k)],   # uniform
        [1, 2, 4, 8, 16] * (k // 5) + [0] * (k % 5),  # powers of two
    ]
    for sv in patterns:
        got = bn.g1_msm_fixed(sv, pts)
        want = bn.g1_msm(sv, pts)
        assert bn.g1_to_affine(got) == bn.g1_to_affine(want)


def test_bn254_g2_fixed_msm_matches_generic():
    from libzkp_tpu.ops import bn254 as bn

    k = 9
    g2 = bn.g2_from_affine((bn.G2_GEN_X, bn.G2_GEN_Y))
    pts = [bn.g2_scalar_mul(rng.randrange(1, bn.R), g2) for _ in range(k)]
    for sv in ([5] * k, [rng.randrange(bn.R) for _ in range(k)]):
        got = bn.g2_msm_fixed(sv, pts)
        want = bn.g2_msm(sv, pts)
        assert bn.g2_to_affine(got) == bn.g2_to_affine(want)


def test_batched_pedersen_compression_matches_scalar_path():
    """pedersen_commit_compressed_many (8-lane msm + lockstep RFC 9496
    encode) must agree byte-for-byte with the scalar commit+compress path,
    including ragged (non-multiple-of-8) batches."""
    from libzkp_tpu.models.bp_generators import (
        pedersen_commit,
        pedersen_commit_compressed_many,
    )

    for count in (1, 5, 8, 11):
        pairs = [
            (rng.randrange(ed.L), rng.randrange(ed.L)) for _ in range(count)
        ]
        got = pedersen_commit_compressed_many(pairs)
        want = [ed.compress(pedersen_commit(v, b)) for v, b in pairs]
        assert got == want


def test_pairing_bilinearity_and_final_exp_chain():
    """Pins the fast final-exponentiation chain (cyclotomic x-chain) and the
    projective Miller loop: e(aP, bQ) == e(abP, Q) and the product form used
    by Groth16 verification collapses to one."""
    from libzkp_tpu.ops import bn254 as bn

    g1 = bn.g1_from_affine(bn.G1_GEN)
    g2 = bn.g2_from_affine((bn.G2_GEN_X, bn.G2_GEN_Y))
    a = rng.randrange(1, bn.R)
    b = rng.randrange(1, bn.R)
    lhs = bn.pairing(bn.g2_scalar_mul(b, g2), bn.g1_scalar_mul(a, g1))
    rhs = bn.pairing(g2, bn.g1_scalar_mul(a * b % bn.R, g1))
    assert lhs == rhs
    prod = bn.multi_pairing(
        [
            (bn.g1_scalar_mul(a, g1), bn.g2_scalar_mul(b, g2)),
            (bn.g1_neg(bn.g1_scalar_mul(a * b % bn.R, g1)), g2),
        ]
    )
    assert prod == bn.FQ12_ONE
