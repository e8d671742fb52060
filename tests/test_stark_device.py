"""Tests for the fused STARK device LDE+commit program."""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from libzkp_tpu.models.merkle import hash_element_rows
from libzkp_tpu.ops import stark_device as sdv
from libzkp_tpu.ops.field import F128
from libzkp_tpu.ops.limb import get_context
from libzkp_tpu.ops import ntt as nttmod
from libzkp_tpu.models import stark


def test_canon_f128_device():
    ctx = get_context(F128.p)
    rng = np.random.default_rng(7)
    vals = [int.from_bytes(rng.bytes(16), "little") for _ in range(32)]
    vals += [0, 1, F128.p - 1, F128.p - 2]
    # feed RELAXED representations: encode then push through mont round trip
    x = ctx.encode(vals)
    xm = ctx.to_mont(x)
    x_rel = ctx.from_mont(xm)  # relaxed (-p, 2p)
    canon = np.asarray(sdv.canon_f128_device(ctx, x_rel))
    assert canon.min() >= 0 and canon.max() < (1 << 12)
    for i, v in enumerate(vals):
        got = sum(int(c) << (12 * j) for j, c in enumerate(canon[i]))
        assert got == v % F128.p, f"idx {i}"


def test_limbs_to_words():
    ctx = get_context(F128.p)
    rng = np.random.default_rng(8)
    vals = [int.from_bytes(rng.bytes(16), "little") % F128.p for _ in range(16)]
    x = jnp.asarray(ctx.encode(vals))
    words = np.asarray(sdv.limbs_to_u32_words(x, 16))
    for i, v in enumerate(vals):
        want = v.to_bytes(16, "little")
        got = words[i].astype("<u4").tobytes()
        assert got == want, f"idx {i}"


def test_lde_commit_matches_host():
    opts = stark.ProofOptions()
    rng = np.random.default_rng(9)
    B, n = 5, 8
    traces = [
        [int.from_bytes(rng.bytes(16), "little") % F128.p for _ in range(n)]
        for _ in range(B)
    ]
    polys, ldes, leaves = sdv.coset_lde_commit_batch(
        F128.p, traces, opts.blowup, stark.DOMAIN_OFFSET
    )
    w_polys, w_ldes = nttmod.coset_lde_batch(
        F128.p, traces, opts.blowup, stark.DOMAIN_OFFSET
    )
    assert polys == w_polys
    assert ldes == w_ldes
    for b in range(B):
        want = hash_element_rows(F128, [[v] for v in ldes[b]])
        assert leaves[b] == want, f"proof {b}"
