#!/usr/bin/env python
"""In-Pallas point-add microbenchmark: current int32 padd vs shift-free designs.

The plain-XLA prototypes (bench_mul_v2.py) drown in per-op dispatch overhead
at production block shapes; this bench times R chained Edwards padds INSIDE a
single Pallas kernel over a VMEM-resident (4, n, B) block — exactly the
deployment shape of the MSM tree-reduce — for:

  A. production int32 12-bit fold padd (ops/curve_jax.EdwardsEngine.padd)
  B. f32 balanced 9-bit limbs (n=29), conv/fold/carry-shift as MXU dots
     with Precision.HIGHEST (exact: every partial sum < 2^24)

Prints ns/padd/lane and the implied full-MSM ms/lane (5376 padds).
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

R = 64  # chained padds per kernel invocation
B = 512


def timeit(f, *args, n=7):
    jax.block_until_ready(f(*args))
    best = float("inf")
    for _ in range(n):
        t0 = time.monotonic()
        jax.block_until_ready(f(*args))
        best = min(best, time.monotonic() - t0)
    return best


# ---------------------------------------------------------------------------
# A: production int32 padd
# ---------------------------------------------------------------------------


def bench_current():
    from libzkp_tpu.ops import curve_jax as cj

    eng = cj.edwards_engine()
    n = eng.n
    nc = eng.consts_np.shape[0]

    def kernel(c_ref, p_ref, q_ref, o_ref):
        consts = c_ref[:]
        q = q_ref[:]

        def body(_, p):
            return eng.padd(consts, p, q)

        o_ref[:] = jax.lax.fori_loop(0, R, body, p_ref[:])

    @jax.jit
    def run(consts, p, q):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((4, n, B), jnp.int32),
            in_specs=[
                pl.BlockSpec((nc, n), memory_space=pltpu.VMEM),
                pl.BlockSpec((4, n, B), memory_space=pltpu.VMEM),
                pl.BlockSpec((4, n, B), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((4, n, B), memory_space=pltpu.VMEM),
        )(consts, p, q)

    consts = jnp.asarray(eng.consts_np)
    # real points: random multiples of the basepoint, one per lane
    from libzkp_tpu.ops import ed25519 as ed

    pts = [ed.scalar_mul(7 + 13 * i, ed.BASEPOINT) for i in range(4)]
    enc = eng.encode_points(pts)  # (4, 4, n)
    p0 = jnp.asarray(np.broadcast_to(enc[0][..., None], (4, n, B)).copy())
    q0 = jnp.asarray(np.broadcast_to(enc[1][..., None], (4, n, B)).copy())
    dt = timeit(run, consts, p0, q0)
    ns = dt / (R * B) * 1e9
    print(f"A int32 padd   : {ns:8.1f} ns/padd/lane -> {ns*5376/1e6:6.3f} ms/lane MSM", flush=True)

    # correctness
    out = np.asarray(run(consts, p0, q0))
    want = enc[0]
    ptw = pts[0]
    for _ in range(R):
        ptw = ed.point_add(ptw, pts[1])
    got = eng.decode_points(np.transpose(out, (2, 0, 1))[:1])[0]
    # compare projectively: X/Z, Y/Z
    inv = pow(got[2], ed.P - 2, ed.P)
    winv = pow(ptw[2], ed.P - 2, ed.P)
    assert got[0] * inv % ed.P == ptw[0] * winv % ed.P, "A wrong X"
    assert got[1] * inv % ed.P == ptw[1] * winv % ed.P, "A wrong Y"
    print("A correct", flush=True)
    return ns


# ---------------------------------------------------------------------------
# B: f32 balanced-limb MXU padd
# ---------------------------------------------------------------------------

W = 9
NF = 29  # 261 bits
NC = 2 * NF + 2  # 60 conv columns
HALF = 1 << (W - 1)
TW = float(1 << W)
ITW = 1.0 / TW
RND = float(3 << (22 + W))


def to_balanced(x, n_):
    out = np.zeros(n_, dtype=np.float64)
    for i in range(n_):
        d = x & ((1 << W) - 1)
        x >>= W
        if d >= HALF:
            d -= 1 << W
            x += 1
        out[i] = d
    assert x == 0
    return out


def from_balanced(v, p):
    return sum(int(round(float(c))) << (W * i) for i, c in enumerate(v)) % p


def build_consts():
    from libzkp_tpu.ops import ed25519 as ed

    p = ed.P
    # conv one-hot: (NC, NF*NF)
    Cm = np.zeros((NC, NF * NF), dtype=np.float32)
    for i in range(NF):
        for j in range(NF):
            Cm[i + j, i * NF + j] = 1.0
    FOLDm = np.stack(
        [to_balanced((1 << (W * (NF + i))) % p, NF) for i in range(NF + 2)]
    ).astype(np.float32)  # (NF+2, NF) -> use transposed (NF, NF+2)
    ONEm = to_balanced((1 << (W * NF)) % p, NF).astype(np.float32)
    # carry-shift matrix with wrap baked in: hi moves up one limb, top hi
    # wraps through ONE. (NF, NF): col k holds destination weights of hi_k.
    Um = np.zeros((NF, NF), dtype=np.float32)
    for k in range(NF - 1):
        Um[k + 1, k] = 1.0
    Um[:, NF - 1] = ONEm
    TWOD = to_balanced(2 * ed.D % p, NF).astype(np.float32)
    return Cm, FOLDm.T.copy(), Um, TWOD, p


def bench_mxu():
    from libzkp_tpu.ops import ed25519 as ed

    Cm, FmT, Um, TWOD, p = build_consts()
    HI = jax.lax.Precision.HIGHEST

    def dot(a, b):
        return jax.lax.dot_general(
            a, b, (((1,), (0,)), ((), ())),
            precision=HI, preferred_element_type=jnp.float32,
        )

    def carry(x, U):
        hi2w = (x + RND) - RND
        lo = x - hi2w
        return lo + dot(U, hi2w * ITW)

    def carry_nw(T):
        hi2w = (T + RND) - RND
        lo = T - hi2w
        return lo + jnp.pad((hi2w * ITW)[:-1, :], ((1, 0), (0, 0)))

    def mul(a, b, C, FT, U):
        O = (a[:, None, :] * b[None, :, :]).reshape(NF * NF, B)
        T = dot(C, O)  # (NC, B)
        T = carry_nw(carry_nw(T))
        acc = T[:NF, :] + dot(FT, T[NF:, :])
        return carry(carry(carry(acc, U), U), U)

    def padd(P, Q, C, FT, U, twod):
        X1, Y1, Z1, T1 = P
        X2, Y2, Z2, T2 = Q
        A = mul(Y1 - X1, Y2 - X2, C, FT, U)
        Bv = mul(Y1 + X1, Y2 + X2, C, FT, U)
        Cc = mul(mul(T1, T2, C, FT, U), twod, C, FT, U)
        zz = mul(Z1, Z2, C, FT, U)
        D = zz + zz
        E = Bv - A
        F = D - Cc
        G = D + Cc
        H = Bv + A
        return (
            mul(E, F, C, FT, U),
            mul(G, H, C, FT, U),
            mul(F, G, C, FT, U),
            mul(E, H, C, FT, U),
        )

    def kernel(c_ref, f_ref, u_ref, d_ref, p_ref, q_ref, o_ref):
        C, FT, U = c_ref[:], f_ref[:], u_ref[:]
        twod = d_ref[:]
        Q = tuple(q_ref[i] for i in range(4))

        def body(_, P):
            return padd(P, Q, C, FT, U, twod)

        P = tuple(p_ref[i] for i in range(4))
        out = jax.lax.fori_loop(0, R, body, P)
        for i in range(4):
            o_ref[i] = out[i]

    @jax.jit
    def run(C, FT, U, twod, pQ, qQ):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((4, NF, B), jnp.float32),
            in_specs=[
                pl.BlockSpec((NC, NF * NF), memory_space=pltpu.VMEM),
                pl.BlockSpec((NF, NF + 2), memory_space=pltpu.VMEM),
                pl.BlockSpec((NF, NF), memory_space=pltpu.VMEM),
                pl.BlockSpec((NF, B), memory_space=pltpu.VMEM),
                pl.BlockSpec((4, NF, B), memory_space=pltpu.VMEM),
                pl.BlockSpec((4, NF, B), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((4, NF, B), memory_space=pltpu.VMEM),
        )(C, FT, U, twod, pQ, qQ)

    pts = [ed.scalar_mul(7 + 13 * i, ed.BASEPOINT) for i in range(4)]

    def encode(pt):
        return np.stack([to_balanced(c % p, NF) for c in pt]).astype(np.float32)

    e0, e1 = encode(pts[0]), encode(pts[1])
    pQ = jnp.asarray(np.broadcast_to(e0[..., None], (4, NF, B)).copy())
    qQ = jnp.asarray(np.broadcast_to(e1[..., None], (4, NF, B)).copy())
    C, FT, U = jnp.asarray(Cm), jnp.asarray(FmT), jnp.asarray(Um)
    twod = jnp.asarray(np.broadcast_to(TWOD[:, None], (NF, B)).copy())

    dt = timeit(run, C, FT, U, twod, pQ, qQ)
    ns = dt / (R * B) * 1e9
    print(f"B f32 MXU padd : {ns:8.1f} ns/padd/lane -> {ns*5376/1e6:6.3f} ms/lane MSM", flush=True)

    out = np.asarray(run(C, FT, U, twod, pQ, qQ))
    ptw = pts[0]
    for _ in range(R):
        ptw = ed.point_add(ptw, pts[1])
    got = [from_balanced(out[i, :, 0].astype(np.float64), p) for i in range(4)]
    inv = pow(got[2], p - 2, p)
    winv = pow(ptw[2], p - 2, p)
    assert got[0] * inv % p == ptw[0] * winv % p, "B wrong X"
    assert got[1] * inv % p == ptw[1] * winv % p, "B wrong Y"
    mx = np.abs(out).max()
    print(f"B correct (max |limb| {mx:.0f} <= {HALF + 32})", flush=True)
    return ns


def main():
    print("backend:", jax.default_backend(), flush=True)
    a = bench_current()
    b = bench_mxu()
    print(f"speedup B vs A: {a/b:.2f}x", flush=True)


if __name__ == "__main__":
    main()
