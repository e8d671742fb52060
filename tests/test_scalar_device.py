"""Differential tests for the device mod-l scalar engine."""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from libzkp_tpu.ops import scalar_device as sd
from libzkp_tpu.ops.limbfold import FieldOps

L = sd.L_ORDER
B = 8


@pytest.fixture(scope="module")
def ctx():
    return sd.get_scalar_ctx()


def _enc(ctx, vals):
    """ints -> (n, B) device limb array."""
    arr = ctx.encode(vals)  # (B, n)
    return jnp.asarray(np.transpose(arr, (1, 0)))


def _dec(ctx, arr):
    return ctx.decode(np.transpose(np.asarray(arr), (1, 0)))


def test_mul_add_inv(ctx):
    rng = np.random.default_rng(1)
    xs = [int.from_bytes(rng.bytes(32), "little") % L for _ in range(B)]
    ys = [int.from_bytes(rng.bytes(32), "little") % L for _ in range(B)]
    consts = jnp.asarray(ctx.consts_np)
    f = ctx.field(consts)
    X, Y = _enc(ctx, xs), _enc(ctx, ys)
    assert _dec(ctx, f.mul(X, Y)) == [x * y % L for x, y in zip(xs, ys)]
    assert _dec(ctx, f.add(X, Y)) == [(x + y) % L for x, y in zip(xs, ys)]
    inv = jax.jit(lambda a: sd.inv_device(f, a))(X)
    assert _dec(ctx, inv) == [pow(x, -1, L) for x in xs]


def test_digit_windows_represent_value_mod_l(ctx):
    rng = np.random.default_rng(2)
    xs = [int.from_bytes(rng.bytes(32), "little") % L for _ in range(B)]
    consts = jnp.asarray(ctx.consts_np)
    f = ctx.field(consts)
    X = _enc(ctx, xs)
    # put X through some ring ops first so the input limbs are RELAXED
    X2 = f.sub(f.mul(X, X), X)
    want = [(x * x - x) % L for x in xs]
    dw = jax.jit(lambda a: sd.strict_digit_windows(f, ctx, a))(X2)
    dwn = np.asarray(dw)  # (32, B) high first
    assert dwn.min() >= 0 and dwn.max() <= 255
    for b in range(B):
        v = 0
        for row in dwn[:, b]:
            v = (v << 8) + int(row)
        assert v % L == want[b], f"lane {b}"


def test_digit_windows_vector_shape(ctx):
    """(K, n, B) scalar vectors -> (32, K, B) windows, all lanes correct."""
    rng = np.random.default_rng(3)
    K = 4
    vals = [[int.from_bytes(rng.bytes(32), "little") % L for _ in range(B)] for _ in range(K)]
    consts = jnp.asarray(ctx.consts_np)
    f = ctx.field(consts)
    stacked = jnp.stack([_enc(ctx, v) for v in vals], axis=0)  # (K, n, B)
    dw = np.asarray(jax.jit(lambda a: sd.strict_digit_windows(f, ctx, a))(stacked))
    assert dw.shape == (32, K, B)
    for k in range(K):
        for b in range(B):
            v = 0
            for row in dw[:, k, b]:
                v = (v << 8) + int(row)
            assert v % L == vals[k][b]


def test_reduce_wide_matches_int(ctx):
    rng = np.random.default_rng(4)
    raws = [rng.bytes(64) for _ in range(B)]
    rows = np.zeros((64, B), dtype=np.uint32)
    for b, r in enumerate(raws):
        rows[:, b] = np.frombuffer(r, dtype=np.uint8)
    consts = jnp.asarray(ctx.consts_np)
    f = ctx.field(consts)
    out = jax.jit(lambda a: sd.reduce_wide(f, ctx, a))(jnp.asarray(rows))
    got = _dec(ctx, out)
    want = [int.from_bytes(r, "little") % L for r in raws]
    assert got == want


def test_digit_windows_adversarial_values(ctx):
    """Worst-case values for the floors-biased strict normalization: top
    limbs saturated, values just above/below multiples of l, and long
    relaxed chains (the round-5 carry-bound regression class)."""
    consts = jnp.asarray(ctx.consts_np)
    f = ctx.field(consts)
    special = [
        0, 1, L - 1, L - 2, (1 << 252) - 1, 1 << 252, (1 << 252) + 1,
        sd.DELTA, L - sd.DELTA,
        int("fff" * 21, 16) % L,  # all-0xFFF limb pattern
        (1 << 251) + (1 << 128),
    ]
    rng = np.random.default_rng(5)
    special += [int.from_bytes(rng.bytes(32), "little") % L for _ in range(5)]
    X = _enc(ctx, special)
    # drive limbs into the worst RELAXED state: a 64-term product sum
    # followed by three carries (the prover's exact pattern), then more muls
    terms = jnp.stack([f.mul(X, X) for _ in range(64)], axis=0)
    import jax

    summed = jnp.sum(terms, axis=0)
    relaxed = f.carry(f.carry(f.carry(summed)))
    relaxed = f.mul(relaxed, X)
    want = [pow(x, 2, L) * 64 % L * x % L for x in special]
    dw = np.asarray(jax.jit(lambda a: sd.strict_digit_windows(f, ctx, a))(relaxed))
    assert dw.min() >= 0 and dw.max() <= 255
    for b, x in enumerate(special):
        v = 0
        for row in dw[:, b]:
            v = (v << 8) + int(row)
        assert v % L == want[b], f"value {x:#x}"
