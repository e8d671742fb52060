"""Device NTT vs host golden model (jitted)."""

import random

import pytest

from libzkp_tpu.ops import ntt as poly
from libzkp_tpu.ops.field import BN254_FR, F128
from libzkp_tpu.ops.limb import get_context

rng = random.Random(17)


@pytest.mark.parametrize(
    "F,size",
    [(F128, 8), (F128, 64), (BN254_FR, 64), (BN254_FR, 1024)],
    ids=lambda v: getattr(v, "name", v),
)
def test_ntt_device_matches_host(F, size):
    ctx = get_context(F.p, F.name)
    vals = [rng.randrange(F.p) for _ in range(size)]
    host = poly.ntt(F, vals)
    dev = poly.ntt_batch(ctx, ctx.to_mont(ctx.encode(vals))[None, :, :])
    assert ctx.decode(ctx.from_mont(dev)) == host
    inv = poly.ntt_batch(
        ctx, ctx.to_mont(ctx.encode(host))[None, :, :], invert=True
    )
    assert ctx.decode(ctx.from_mont(inv)) == vals


def test_ntt_device_batched():
    ctx = get_context(F128.p, F128.name)
    batches = [[rng.randrange(F128.p) for _ in range(16)] for _ in range(5)]
    import jax.numpy as jnp

    x = jnp.stack([ctx.to_mont(ctx.encode(b)) for b in batches])
    out = poly.ntt_batch(ctx, x)
    got = ctx.decode(ctx.from_mont(out))
    want = [v for b in batches for v in poly.ntt(F128, b)]
    assert got == want
