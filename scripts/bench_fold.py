#!/usr/bin/env python
"""Probe: fold-based modular multiply (conv -> carry -> constant FOLD matrix)
with no sequential REDC chain, in jnp vs Pallas, for ed25519 and BN254 Fq.

Bound sketch (n=22 12-bit limbs, relaxed |limb| <~ 2^13.05):
  conv columns <= 22 * 2^26.1 < 2^30.6 (int32 ok)
  2 no-wrap carries -> limbs <= 4095 + 2^6 + eps
  fold: 24 rows x products <= 4100*4095, sum < 2^28.7 (int32 ok)
  3 wrap carries -> relaxed (top limb of 2^(12n) mod p < 2^4 keeps wraps tiny)
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

LIMB_BITS = 12
LIMB_MASK = (1 << LIMB_BITS) - 1
N = 22


def timeit(f, *args, n=5):
    jax.block_until_ready(f(*args))
    best = float("inf")
    for _ in range(n):
        t0 = time.monotonic()
        jax.block_until_ready(f(*args))
        best = min(best, time.monotonic() - t0)
    return best


def int_to_limbs(x, n):
    out = np.zeros(n, np.int32)
    for i in range(n):
        out[i] = x & LIMB_MASK
        x >>= LIMB_BITS
    assert x == 0
    return out


def limbs_to_int(v):
    x = 0
    for i, t in enumerate(np.asarray(v, np.int64).tolist()):
        x += int(t) << (12 * i)
    return x


def make_consts(p):
    FOLD = np.stack(
        [int_to_limbs((1 << (12 * (N + i))) % p, N) for i in range(N + 2)]
    )  # (N+2, N)
    ONE = int_to_limbs((1 << (12 * N)) % p, N)
    return FOLD, ONE


def carry_nw(x):
    lo = x & LIMB_MASK
    hi = x >> LIMB_BITS
    return lo + jnp.pad(hi[:-1, :], [(1, 0), (0, 0)])


def carry_w(x, one_l):
    lo = x & LIMB_MASK
    hi = x >> LIMB_BITS
    return lo + jnp.pad(hi[:-1, :], [(1, 0), (0, 0)]) + hi[-1:, :] * one_l


def fold_mul(a, b, fold_c, one_l):
    NC = 2 * N + 2
    T = sum(
        jnp.pad(a * b[j : j + 1, :], [(j, NC - N - j), (0, 0)]) for j in range(N)
    )
    T = carry_nw(carry_nw(T))
    acc = T[:N]
    for i in range(N + 2):
        acc = acc + T[N + i : N + i + 1, :] * fold_c[i][:, None]
    return carry_w(carry_w(carry_w(acc, one_l), one_l), one_l)


def padd_val(p_, q_, fold_c, one_l, two_d):
    mm = lambda x, y: fold_mul(x, y, fold_c, one_l)
    ca = lambda x: carry_w(x, one_l)
    add = lambda x, y: ca(x + y)
    sub = lambda x, y: ca(x - y)
    X1, Y1, Z1, T1 = p_[0], p_[1], p_[2], p_[3]
    X2, Y2, Z2, T2 = q_[0], q_[1], q_[2], q_[3]
    A_ = mm(sub(Y1, X1), sub(Y2, X2))
    B_ = mm(add(Y1, X1), add(Y2, X2))
    C_ = mm(mm(T1, T2), two_d)
    zz = mm(Z1, Z2)
    D_ = add(zz, zz)
    E_ = sub(B_, A_)
    F_ = sub(D_, C_)
    G_ = add(D_, C_)
    H_ = add(B_, A_)
    return jnp.stack([mm(E_, F_), mm(G_, H_), mm(F_, G_), mm(E_, H_)])


def bench_field(name, p, E, LANES):
    import random

    FOLD, ONE = make_consts(p)
    fold_j = jnp.asarray(FOLD)
    one_j = jnp.asarray(ONE)[:, None]
    vals_a = [random.randrange(p) for _ in range(64)]
    vals_b = [random.randrange(p) for _ in range(64)]
    A = np.zeros((N, E), np.int32)
    B = np.zeros((N, E), np.int32)
    for i in range(64):
        A[:, i::64] = int_to_limbs(vals_a[i], N)[:, None]
        B[:, i::64] = int_to_limbs(vals_b[i], N)[:, None]
    Aj, Bj = jnp.asarray(A), jnp.asarray(B)

    @jax.jit
    def jx(a, b):
        return fold_mul(a, b, fold_j, one_j)

    dt = timeit(jx, Aj, Bj)
    print(f"jnp fold mul ({name}):    {E/dt/1e6:8.1f} M/s ({dt*1e3:.2f} ms)")
    got = np.asarray(jx(Aj, Bj))
    for i in range(64):
        assert limbs_to_int(got[:, i]) % p == vals_a[i] * vals_b[i] % p, i

    cg = jnp.asarray(np.concatenate([ONE[None, :], FOLD], axis=0))

    def kern(c_ref, a_ref, b_ref, o_ref):
        o_ref[:] = fold_mul(a_ref[:], b_ref[:], c_ref[1:], c_ref[0][:, None])

    @jax.jit
    def px(a, b):
        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((N, E), jnp.int32),
            grid=(E // LANES,),
            in_specs=[
                pl.BlockSpec((N + 3, N), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((N, LANES), lambda i: (0, i), memory_space=pltpu.VMEM),
                pl.BlockSpec((N, LANES), lambda i: (0, i), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((N, LANES), lambda i: (0, i), memory_space=pltpu.VMEM),
        )(cg, a, b)

    dt = timeit(px, Aj, Bj)
    print(f"pallas fold mul ({name}): {E/dt/1e6:8.1f} M/s ({dt*1e3:.2f} ms)")
    got = np.asarray(px(Aj, Bj))
    for i in range(64):
        assert limbs_to_int(got[:, i]) % p == vals_a[i] * vals_b[i] % p, i
    print("match: True")
    return FOLD, ONE


def main():
    print("backend:", jax.default_backend())
    import random

    random.seed(5)
    E = 1 << 20
    LANES = 512
    P_ED = (1 << 255) - 19
    PQ = 21888242871839275222246405745257275088696311157297823662689037894645226208583

    FOLD, ONE = bench_field("ed25519", P_ED, E, LANES)
    bench_field("bn254fq", PQ, E, LANES)

    # ---- point add over the ed25519 fold field -----------------------------
    TWO_D = int_to_limbs(2 * ((-121665 * pow(121666, -1, P_ED)) % P_ED) % P_ED, N)
    cc = jnp.asarray(np.concatenate([ONE[None, :], TWO_D[None, :], FOLD], axis=0))

    def kern2(c_ref, p_ref, q_ref, o_ref):
        o_ref[:] = padd_val(
            p_ref[:], q_ref[:], c_ref[2:], c_ref[0][:, None], c_ref[1][:, None]
        )

    E2 = 1 << 18

    @jax.jit
    def pl_add(p_, q_):
        return pl.pallas_call(
            kern2,
            out_shape=jax.ShapeDtypeStruct((4, N, E2), jnp.int32),
            grid=(E2 // LANES,),
            in_specs=[
                pl.BlockSpec((N + 4, N), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((4, N, LANES), lambda i: (0, 0, i), memory_space=pltpu.VMEM),
                pl.BlockSpec((4, N, LANES), lambda i: (0, 0, i), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (4, N, LANES), lambda i: (0, 0, i), memory_space=pltpu.VMEM
            ),
        )(cc, p_, q_)

    from libzkp_tpu.ops import ed25519 as ed

    pts = [ed.from_uniform_bytes(random.randbytes(64)) for _ in range(8)]
    qts = [ed.from_uniform_bytes(random.randbytes(64)) for _ in range(8)]
    Pt = np.zeros((4, N, E2), np.int32)
    Qt = np.zeros((4, N, E2), np.int32)
    for i in range(8):
        for c in range(4):
            Pt[c, :, i::8] = int_to_limbs(pts[i][c], N)[:, None]
            Qt[c, :, i::8] = int_to_limbs(qts[i][c], N)[:, None]
    Ptj, Qtj = jnp.asarray(Pt), jnp.asarray(Qt)
    dt = timeit(pl_add, Ptj, Qtj)
    print(f"pallas fold point add: {E2/dt/1e6:7.2f} M adds/s ({dt*1e3:.2f} ms)")
    got = np.asarray(pl_add(Ptj, Qtj))
    for i in range(8):
        coords = tuple(limbs_to_int(got[c, :, i]) % P_ED for c in range(4))
        assert ed.point_equal(coords, ed.point_add(pts[i], qts[i])), i
    print("point add match: True")

    fold_j = jnp.asarray(FOLD)
    one_j = jnp.asarray(ONE)[:, None]
    twod_j = jnp.asarray(TWO_D)[:, None]

    @jax.jit
    def jnp_add(p_, q_):
        return padd_val(p_, q_, fold_j, one_j, twod_j)

    dt = timeit(jnp_add, Ptj, Qtj)
    print(f"jnp fold point add:   {E2/dt/1e6:7.2f} M adds/s ({dt*1e3:.2f} ms)")


if __name__ == "__main__":
    main()
