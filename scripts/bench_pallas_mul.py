#!/usr/bin/env python
"""Probe: Pallas mont_mul / point-add kernels (all intermediates in VMEM).

Field-element layout inside kernels: (n_limbs, LANES) — limbs on sublanes,
batch elements on lanes. Field constants (p limbs, R mod p, 2d) are passed
as a small input block (Pallas forbids captured array constants).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def timeit(f, *args, n=5):
    jax.block_until_ready(f(*args))
    best = float("inf")
    for _ in range(n):
        t0 = time.monotonic()
        jax.block_until_ready(f(*args))
        best = min(best, time.monotonic() - t0)
    return best


LIMB_MASK = (1 << 12) - 1


def make_field(n, ninv):
    """Field ops on (n, L) values given a loaded consts block (3, n)."""

    def ops(consts):
        p_l = consts[0][:, None]  # (n, 1)
        one_l = consts[1][:, None]

        def carry(x):
            lo = x & LIMB_MASK
            hi = x >> 12
            hi_shift = jnp.pad(hi[:-1, :], [(1, 0), (0, 0)])
            wrap = hi[-1:, :]
            return lo + hi_shift + wrap * one_l

        def mont_mul(a, b):
            # schoolbook columns, static pads (scatter is unsupported in Pallas)
            T = sum(
                jnp.pad(a * b[j : j + 1, :], [(j, n - j), (0, 0)]) for j in range(n)
            )
            for i in range(n):
                ti = T[i : i + 1]
                m = ((ti & LIMB_MASK) * ninv) & LIMB_MASK
                upd = jnp.pad(m * p_l, [(i, n - i), (0, 0)])
                upd += jnp.pad((ti + m * p_l[0:1]) >> 12, [(i + 1, 2 * n - i - 2), (0, 0)])
                T = T + upd
            T = T[n:]
            return carry(carry(carry(T)))

        add = lambda x, y: carry(x + y)
        sub = lambda x, y: carry(x - y)
        return mont_mul, add, sub, carry

    return ops


def main():
    print("backend:", jax.default_backend())
    from libzkp_tpu.ops import curve_jax as cj
    from libzkp_tpu.ops import ed25519 as ed
    from libzkp_tpu.ops.limb import _limbs_to_int, get_context

    ctx = get_context(ed.P)
    n = ctx.n
    eng = cj.edwards_engine()
    consts_np = np.stack(
        [np.asarray(ctx.p_limbs), np.asarray(ctx.one_mont), np.asarray(eng.two_d)]
    ).astype(np.int32)
    consts = jnp.asarray(consts_np)
    field = make_field(n, np.int32(ctx.ninv))

    LANES = 512

    def mul_kernel(consts_ref, a_ref, b_ref, o_ref):
        mont_mul, _, _, _ = field(consts_ref[:])
        o_ref[:] = mont_mul(a_ref[:], b_ref[:])

    E = 1 << 20
    grid = E // LANES

    @jax.jit
    def pallas_mul(a, b):
        return pl.pallas_call(
            mul_kernel,
            out_shape=jax.ShapeDtypeStruct((n, E), jnp.int32),
            grid=(grid,),
            in_specs=[
                pl.BlockSpec((3, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((n, LANES), lambda i: (0, i), memory_space=pltpu.VMEM),
                pl.BlockSpec((n, LANES), lambda i: (0, i), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (n, LANES), lambda i: (0, i), memory_space=pltpu.VMEM
            ),
        )(consts, a, b)

    rng = np.random.randint(-4096, 4096, (2, n, E), np.int32)
    a = jnp.asarray(rng[0])
    b = jnp.asarray(rng[1])
    dt = timeit(pallas_mul, a, b)
    print(f"pallas mont_mul: {E/dt/1e6:8.1f} M/s ({dt*1e3:.2f} ms for 2^20)")

    got = np.asarray(pallas_mul(a, b))
    want = np.asarray(
        jax.jit(ctx.mont_mul)(jnp.asarray(rng[0].T), jnp.asarray(rng[1].T))
    )
    for i in range(0, E, E // 7):
        assert _limbs_to_int(got[:, i]) % ctx.p == _limbs_to_int(want[i]) % ctx.p, i
    print("match: True")

    # ---- point add kernel: (4, n, L) blocks -------------------------------
    def point_add_val(fieldops, consts, p, q):
        mm, add, sub, _ = fieldops(consts)
        X1, Y1, Z1, T1 = p[0], p[1], p[2], p[3]
        X2, Y2, Z2, T2 = q[0], q[1], q[2], q[3]
        two_d = consts[2][:, None]
        A = mm(sub(Y1, X1), sub(Y2, X2))
        B = mm(add(Y1, X1), add(Y2, X2))
        C = mm(mm(T1, T2), two_d)
        zz = mm(Z1, Z2)
        D = add(zz, zz)
        E_ = sub(B, A)
        F = sub(D, C)
        G = add(D, C)
        H = add(B, A)
        return jnp.stack([mm(E_, F), mm(G, H), mm(F, G), mm(E_, H)])

    def add_kernel(consts_ref, p_ref, q_ref, o_ref):
        o_ref[:] = point_add_val(field, consts_ref[:], p_ref[:], q_ref[:])

    E2 = 1 << 18
    grid2 = E2 // LANES

    @jax.jit
    def pallas_add(p, q):
        return pl.pallas_call(
            add_kernel,
            out_shape=jax.ShapeDtypeStruct((4, n, E2), jnp.int32),
            grid=(grid2,),
            in_specs=[
                pl.BlockSpec((3, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec(
                    (4, n, LANES), lambda i: (0, 0, i), memory_space=pltpu.VMEM
                ),
                pl.BlockSpec(
                    (4, n, LANES), lambda i: (0, 0, i), memory_space=pltpu.VMEM
                ),
            ],
            out_specs=pl.BlockSpec(
                (4, n, LANES), lambda i: (0, 0, i), memory_space=pltpu.VMEM
            ),
        )(consts, p, q)

    import random

    random.seed(3)
    pts = [ed.from_uniform_bytes(random.randbytes(64)) for _ in range(8)]
    qts = [ed.from_uniform_bytes(random.randbytes(64)) for _ in range(8)]
    pm = np.asarray(eng.encode_points(pts))
    qm = np.asarray(eng.encode_points(qts))
    P_arr = np.zeros((4, n, E2), np.int32)
    Q_arr = np.zeros((4, n, E2), np.int32)
    for i in range(8):
        P_arr[:, :, i::8] = pm[i][..., None]
        Q_arr[:, :, i::8] = qm[i][..., None]
    Pj, Qj = jnp.asarray(P_arr), jnp.asarray(Q_arr)
    dt = timeit(pallas_add, Pj, Qj)
    print(f"pallas point add: {E2/dt/1e6:7.2f} M adds/s ({dt*1e3:.2f} ms for 2^18)")

    got = np.asarray(pallas_add(Pj, Qj))
    r_inv = pow(ctx.R, -1, ctx.p)
    for i in range(8):
        coords = tuple(
            _limbs_to_int(got[c, :, i]) * r_inv % ctx.p for c in range(4)
        )
        assert ed.point_equal(coords, ed.point_add(pts[i], qts[i])), i
    print("point add match: True")


if __name__ == "__main__":
    main()
