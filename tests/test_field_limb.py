"""L0 field arithmetic: host PrimeField and the TPU limb engine agree."""

import random

import pytest

from libzkp_tpu.ops.field import (
    BN254_FQ,
    BN254_FR,
    ED25519_FP,
    F128,
    F128_TWO_ADIC_ROOT,
    RISTRETTO_L,
)
from libzkp_tpu.ops.limb import get_context

FIELDS = [BN254_FR, BN254_FQ, ED25519_FP, RISTRETTO_L, F128]

rng = random.Random(1234)


@pytest.mark.parametrize("F", FIELDS, ids=lambda f: f.name)
class TestPrimeField:
    def test_basic_ops(self, F):
        for _ in range(20):
            a = rng.randrange(F.p)
            b = rng.randrange(F.p)
            assert F.add(a, b) == (a + b) % F.p
            assert F.sub(a, b) == (a - b) % F.p
            assert F.mul(a, b) == a * b % F.p
            if b:
                assert F.mul(b, F.inv(b)) == 1

    def test_batch_inv(self, F):
        xs = [rng.randrange(1, F.p) for _ in range(17)]
        invs = F.batch_inv(xs)
        assert all(F.mul(x, i) == 1 for x, i in zip(xs, invs))

    def test_sqrt(self, F):
        for _ in range(5):
            a = rng.randrange(1, F.p)
            sq = F.mul(a, a)
            r = F.sqrt(sq)
            assert r is not None and F.mul(r, r) == sq


def test_f128_two_adic_root():
    # winterfell f128: 2-adicity 40
    assert F128.two_adicity == 40
    r = F128_TWO_ADIC_ROOT
    assert pow(r, 1 << 40, F128.p) == 1
    assert pow(r, 1 << 39, F128.p) != 1


@pytest.mark.parametrize("F", FIELDS, ids=lambda f: f.name)
class TestLimbContext:
    def test_encode_decode(self, F):
        ctx = get_context(F.p, F.name)
        vals = [0, 1, F.p - 1] + [rng.randrange(F.p) for _ in range(5)]
        arr = ctx.encode(vals)
        assert ctx.decode(arr) == vals

    def test_add_sub(self, F):
        ctx = get_context(F.p, F.name)
        a_int = [rng.randrange(F.p) for _ in range(16)] + [F.p - 1, F.p - 1]
        b_int = [rng.randrange(F.p) for _ in range(16)] + [F.p - 1, 1]
        a, b = ctx.encode(a_int), ctx.encode(b_int)
        assert ctx.decode(ctx.add(a, b)) == [(x + y) % F.p for x, y in zip(a_int, b_int)]
        assert ctx.decode(ctx.sub(a, b)) == [(x - y) % F.p for x, y in zip(a_int, b_int)]

    def test_mont_mul(self, F):
        ctx = get_context(F.p, F.name)
        a_int = [rng.randrange(F.p) for _ in range(16)] + [F.p - 1, 0, 1]
        b_int = [rng.randrange(F.p) for _ in range(16)] + [F.p - 1, 5, 1]
        am = ctx.to_mont(ctx.encode(a_int))
        bm = ctx.to_mont(ctx.encode(b_int))
        prod = ctx.from_mont(ctx.mont_mul(am, bm))
        assert ctx.decode(prod) == [x * y % F.p for x, y in zip(a_int, b_int)]

    def test_mont_pow5(self, F):
        ctx = get_context(F.p, F.name)
        a_int = [rng.randrange(F.p) for _ in range(8)]
        am = ctx.to_mont(ctx.encode(a_int))
        out = ctx.from_mont(ctx.mont_pow5(am))
        assert ctx.decode(out) == [pow(x, 5, F.p) for x in a_int]

    def test_neg(self, F):
        ctx = get_context(F.p, F.name)
        a_int = [0, 1, F.p - 1] + [rng.randrange(F.p) for _ in range(5)]
        out = ctx.neg(ctx.encode(a_int))
        assert ctx.decode(out) == [(F.p - x) % F.p for x in a_int]
