#!/usr/bin/env python
"""Ablation: which part of the Pallas fold-mul is slow?

Variants (all on (N, LANES) blocks, 2^20 elements):
  a) conv only (22 shifted pad-adds)
  b) conv with 8-aligned grouping (pads by multiples of 8 + 8 residual shifts)
  c) carries only (5 passes)
  d) fold only (24 mult-adds)
  e) full mul, conv variant (a)
  f) full mul, conv variant (b)
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
NC = 2 * N + 2


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


P_ED = (1 << 255) - 19
FOLD = np.stack([int_to_limbs((1 << (12 * (N + i))) % P_ED, N) for i in range(N + 2)])
ONE = int_to_limbs((1 << (12 * N)) % P_ED, N)


def conv_a(a, b):
    return sum(
        jnp.pad(a * b[j : j + 1, :], [(j, NC - N - j), (0, 0)]) for j in range(N)
    )


def conv_b(a, b):
    """Group by j mod 8: aligned pads accumulate, then 8 residual shifts."""
    out = None
    for r in range(8):
        u = None
        for j in range(r, N, 8):
            t = jnp.pad(a * b[j : j + 1, :], [(j - r, NC - N - (j - r)), (0, 0)])
            u = t if u is None else u + t
        if u is None:
            continue
        su = jnp.pad(u[: NC - r], [(r, 0), (0, 0)]) if r else u
        out = su if out is None else out + su
    return out


def carries(x, one_l):
    def nw(t):
        return (t & LIMB_MASK) + jnp.pad((t >> 12)[:-1, :], [(1, 0), (0, 0)])

    def w(t):
        lo = t & LIMB_MASK
        hi = t >> 12
        return lo + jnp.pad(hi[:-1, :], [(1, 0), (0, 0)]) + hi[-1:, :] * one_l

    t = nw(nw(x))
    acc = t[:N]
    return w(w(w(acc, ), ), )  # placeholder; real fold separate


def run(name, fn, shapes, consts):
    def kern(c_ref, *refs):
        o_ref = refs[-1]
        o_ref[:] = fn(c_ref, *[r[:] for r in refs[:-1]])

    E = 1 << 20
    LANES = 512
    in_shapes, out_shape = shapes

    @jax.jit
    def go(*arrs):
        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct(out_shape(E), jnp.int32),
            grid=(E // LANES,),
            in_specs=[
                pl.BlockSpec(consts.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
            ]
            + [
                pl.BlockSpec(s(LANES), lambda i: tuple([0] * (len(s(1)) - 1) + [i]), memory_space=pltpu.VMEM)
                for s in in_shapes
            ],
            out_specs=pl.BlockSpec(
                out_shape(LANES), lambda i: tuple([0] * (len(out_shape(1)) - 1) + [i]), memory_space=pltpu.VMEM
            ),
        )(consts, *arrs)

    E_ = E
    arrs = [
        jnp.asarray(np.random.randint(-4096, 4096, s(E_), np.int32))
        for s in in_shapes
    ]
    dt = timeit(go, *arrs)
    print(f"{name:28s} {E_/dt/1e6:8.1f} M/s ({dt*1e3:6.2f} ms)")


def main():
    print("backend:", jax.default_backend())
    cg = jnp.asarray(np.concatenate([ONE[None, :], FOLD], axis=0))  # (N+3, N)

    two = (lambda L: (N, L), lambda L: (N, L))

    # a) conv only
    run(
        "conv shifted pads",
        lambda c, a, b: conv_a(a, b)[:N] + conv_a(a, b)[N : 2 * N] * 0,
        ((lambda L: (N, L), lambda L: (N, L)), lambda L: (N, L)),
        cg,
    )
    # b) conv 8-aligned
    run(
        "conv 8-aligned",
        lambda c, a, b: conv_b(a, b)[:N] + conv_b(a, b)[N : 2 * N] * 0,
        ((lambda L: (N, L), lambda L: (N, L)), lambda L: (N, L)),
        cg,
    )

    # c) carries only (5 wrap passes)
    def carries5(c, x):
        one_l = c[0][:, None]
        t = x
        for _ in range(5):
            lo = t & LIMB_MASK
            hi = t >> 12
            t = lo + jnp.pad(hi[:-1, :], [(1, 0), (0, 0)]) + hi[-1:, :] * one_l
        return t

    run("5 wrap carries", carries5, ((lambda L: (N, L),), lambda L: (N, L)), cg)

    # d) fold only (24 mult-adds from a (NC, L) input)
    def fold_only(c, t):
        fold_c = c[1:]
        acc = t[:N]
        for i in range(N + 2):
            acc = acc + t[N + i : N + i + 1, :] * fold_c[i][:, None]
        return acc

    run("fold 24 mult-adds", fold_only, ((lambda L: (NC, L),), lambda L: (N, L)), cg)

    # e) 22 plain mult-adds, no shifts (lower bound for conv compute)
    def plain22(c, a, b):
        acc = a * b[0:1, :]
        for j in range(1, N):
            acc = acc + a * b[j : j + 1, :]
        return acc

    run("22 mult-adds no shift", plain22, ((lambda L: (N, L), lambda L: (N, L)), lambda L: (N, L)), cg)


if __name__ == "__main__":
    main()
