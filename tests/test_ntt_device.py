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


class TestShardedNTT:
    """Four-step intra-NTT sharding over the `shard` mesh axis: one
    transform's butterflies split across devices with a single tiled
    all_to_all exchange (SURVEY.md §2.3 "NTT engine")."""

    def test_bit_exact_vs_host(self):
        import jax

        from libzkp_tpu.ops import ntt as nt
        from libzkp_tpu.ops.field import BN254_FR, F128
        from libzkp_tpu.parallel import mesh as meshmod

        if len(jax.devices()) < 2:
            import pytest

            pytest.skip("needs a multi-device mesh")
        mesh = meshmod.get_mesh(dp=len(jax.devices()) // 2, shard=2)
        for F in (F128, BN254_FR):
            vals = [(i * 104729 + 7) % F.p for i in range(64)]
            want = nt.ntt_py(F, vals)
            got = nt.ntt_sharded(F.p, vals, mesh)
            assert got == want
            assert nt.ntt_sharded(F.p, got, mesh, invert=True) == vals

    def test_shard4(self):
        import jax
        import pytest

        from libzkp_tpu.ops import ntt as nt
        from libzkp_tpu.ops.field import F128
        from libzkp_tpu.parallel import mesh as meshmod

        if len(jax.devices()) < 4:
            pytest.skip("needs >= 4 devices")
        mesh = meshmod.get_mesh(dp=len(jax.devices()) // 4, shard=4)
        vals = [(i * 31 + 5) % F128.p for i in range(256)]
        assert nt.ntt_sharded(F128.p, vals, mesh) == nt.ntt_py(F128, vals)


class TestDeviceBlake3:
    """The device BLAKE3 tier must match the pure-Python spec model and the
    C++ tier (single-block leaves + full Merkle levels)."""

    def test_bit_exact(self):
        import os

        from libzkp_tpu.models.merkle import MerkleTree
        from libzkp_tpu.ops import blake3 as b3
        from libzkp_tpu.ops.blake3_device import (
            hash_leaves_device, merkle_tree_device)

        rows = [os.urandom(16) for _ in range(32)]
        want = [b3.blake3_256(r) for r in rows]
        assert hash_leaves_device(rows) == want
        leaves, levels = merkle_tree_device(rows)
        tree = MerkleTree(want)
        assert leaves == want
        assert [lv for lv in levels] == tree.levels[1:]

    def test_hash_element_rows_gate(self, monkeypatch):
        from libzkp_tpu.models.merkle import hash_element_rows
        from libzkp_tpu.ops.field import F128

        rows = [[i, i * 7 + 1] for i in range(16)]
        want = hash_element_rows(F128, rows)
        monkeypatch.setenv("LIBZKP_DEVICE_HASH", "1")
        assert hash_element_rows(F128, rows) == want
