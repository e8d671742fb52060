"""Device Ristretto255 ENCODE/DECODE vs the host model, lane-for-lane.

Closes the last host-only piece of the curve25519-dalek replacement
(SURVEY.md §2.2 row 1: compress/decompress on the device tier; the fold
canonicalization, SQRT_RATIO_M1 power chain and sign logic all run as jnp
on the kernels' FieldOps). Runs on the CPU backend like the rest of the
device-tier tests.
"""

from __future__ import annotations

import random

from libzkp_tpu.ops import ed25519 as ed
from libzkp_tpu.ops.curve_jax import (
    ristretto_compress_device,
    ristretto_decompress_device,
)


def test_compress_matches_host():
    random.seed(7)
    pts = [ed.IDENTITY, ed.BASEPOINT] + [
        ed.scalar_mul(random.randrange(1, ed.L), ed.BASEPOINT) for _ in range(22)
    ]
    assert ristretto_compress_device(pts) == [ed.compress(p) for p in pts]


def test_compress_scaled_representatives_agree():
    random.seed(8)
    for _ in range(4):
        k = random.randrange(1, ed.L)
        P1 = ed.scalar_mul(k, ed.BASEPOINT)
        lam = random.randrange(2, ed.P)
        P2 = tuple(c * lam % ed.P for c in P1)
        a, b = ristretto_compress_device([P1, P2])
        assert a == b == ed.compress(P1)


def test_decompress_matches_host_including_rejections():
    random.seed(9)
    encs = [
        ed.compress(ed.scalar_mul(random.randrange(1, ed.L), ed.BASEPOINT))
        for _ in range(12)
    ]
    encs += [
        b"\x00" * 32,               # identity: valid
        b"\x01" + b"\x00" * 31,     # odd s: rejected
        bytes(range(32)),           # random: whatever the host says
        b"\xff" * 32,               # non-canonical: rejected
        b"\x12" * 31,               # wrong length: rejected
    ]
    got = ristretto_decompress_device(encs)
    want = [ed.decompress(e) for e in encs]
    for i, (g, w) in enumerate(zip(got, want)):
        if w is None:
            assert g is None, i
        else:
            assert g is not None and ed.point_equal(g, w), i


def test_roundtrip_through_device():
    random.seed(10)
    pts = [ed.scalar_mul(random.randrange(1, ed.L), ed.BASEPOINT) for _ in range(8)]
    encs = ristretto_compress_device(pts)
    back = ristretto_decompress_device(encs)
    for p, q in zip(pts, back):
        assert q is not None and ed.ristretto_eq(p, q)
