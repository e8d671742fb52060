"""Differential tests: device curve engines (Pallas fold-field kernels) vs
the host golden tiers. Run on the virtual CPU mesh (Pallas interpret mode) —
the same code path the TPU compiles."""

import random

import numpy as np
import pytest

from libzkp_tpu.ops import bn254 as bn
from libzkp_tpu.ops import curve_jax as cj
from libzkp_tpu.ops import ed25519 as ed

random.seed(1234)


def _rand_ed_points(k):
    return [ed.from_uniform_bytes(random.randbytes(64)) for _ in range(k)]


def _rand_scalars(b, k, order):
    return [[random.randrange(order) for _ in range(k)] for _ in range(b)]


def _apply(engine_fn, pts_np, qts_np):
    """Run a point op on (B, C, n) host arrays via the jnp path."""
    import jax.numpy as jnp

    p = jnp.asarray(np.transpose(pts_np, (1, 2, 0)))  # (C, n, B)
    q = jnp.asarray(np.transpose(qts_np, (1, 2, 0)))
    out = engine_fn(p, q)
    return np.transpose(np.asarray(out), (2, 0, 1))


class TestEdwardsEngine:
    def test_add_double_identity(self):
        import jax.numpy as jnp

        eng = cj.edwards_engine()
        consts = jnp.asarray(eng.consts_np)
        pts = _rand_ed_points(4)
        qts = pts[1:] + pts[:1]
        enc_p = eng.encode_points(pts)
        enc_q = eng.encode_points(qts)
        got = _apply(lambda p, q: eng.padd(consts, p, q), enc_p, enc_q)
        for i in range(4):
            want = ed.point_add(pts[i], qts[i])
            assert ed.point_equal(tuple(eng.decode_points(got[i : i + 1])[0]), want)
        # complete: P+P == double(P); P+identity == P
        got2 = _apply(lambda p, q: eng.padd(consts, p, p), enc_p, enc_p)
        got3 = _apply(lambda p, q: eng.pdouble(consts, p), enc_p, enc_p)
        ident = np.broadcast_to(eng.identity_np()[None], enc_p.shape).copy()
        got4 = _apply(lambda p, q: eng.padd(consts, p, q), enc_p, ident)
        for i in range(4):
            dbl = ed.point_double(pts[i])
            assert ed.point_equal(tuple(eng.decode_points(got2[i : i + 1])[0]), dbl)
            assert ed.point_equal(tuple(eng.decode_points(got3[i : i + 1])[0]), dbl)
            assert ed.point_equal(
                tuple(eng.decode_points(got4[i : i + 1])[0]), pts[i]
            )

    def test_msm_matches_host(self):
        K, B = 9, 5
        pts = _rand_ed_points(K)
        vecs = _rand_scalars(B, K, ed.L)
        vecs[0] = [0] * K  # all-zero vector -> identity
        vecs[1][3] = 0
        table = cj.build_table_ed25519(pts)
        got = cj.msm_many(table, vecs)
        for sv, g in zip(vecs, got):
            want = ed.msm(sv, pts)
            assert ed.point_equal(tuple(g), want)
            assert ed.compress(tuple(g)) == ed.compress(want)


class TestBn254Engines:
    def test_g1_msm_matches_host(self):
        K, B = 7, 4
        g = bn.g1_from_affine(bn.G1_GEN)
        pts = [bn.g1_scalar_mul(random.randrange(bn.R), g) for _ in range(K)]
        pts[2] = bn.G1_INF  # basis containing infinity
        vecs = _rand_scalars(B, K, bn.R)
        vecs[0][0] = 0
        table = cj.build_table_bn254_g1(pts)
        got = cj.msm_many(table, vecs)
        for sv, got_p in zip(vecs, got):
            want = bn.g1_msm(sv, pts)
            assert bn.g1_to_affine(got_p) == bn.g1_to_affine(want)

    def test_g2_msm_matches_host(self):
        K, B = 5, 3
        g2 = bn.g2_from_affine((bn.G2_GEN_X, bn.G2_GEN_Y))
        pts = [bn.g2_scalar_mul(random.randrange(bn.R), g2) for _ in range(K)]
        vecs = _rand_scalars(B, K, bn.R)
        table = cj.build_table_bn254_g2(pts)
        got = cj.msm_many(table, vecs)
        for sv, got_p in zip(vecs, got):
            want = bn.g2_msm(sv, pts)
            assert bn.g2_to_affine(got_p) == bn.g2_to_affine(want)


class TestShardedMsm:
    def test_msm_sharded_matches_host(self):
        """Full (dp, shard) mesh execution on the 8-device CPU mesh."""
        from libzkp_tpu.parallel import mesh as meshmod

        mesh = meshmod.get_mesh(dp=4, shard=2)
        K, B = 6, 5  # K not divisible by shard -> exercises padding
        pts = _rand_ed_points(K)
        vecs = _rand_scalars(B, K, ed.L)
        table = cj.build_table_ed25519(pts)
        got = cj.msm_many_sharded(table, vecs, mesh=mesh)
        for sv, g in zip(vecs, got):
            assert ed.point_equal(tuple(g), ed.msm(sv, pts))
