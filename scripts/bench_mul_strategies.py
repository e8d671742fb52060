#!/usr/bin/env python
"""Microbenchmark: candidate field-mul strategies for the device MSM kernel.

Round-5 kernel engineering (VERDICT r4 #1): the fold-field mul is the inner
loop of every padd; its cost model decides the limb width and number base.
This measures, on the real backend:

  1. raw int32 multiply-add chain vs f32 FMA chain (is int32 mul multi-op?)
  2. the current 12-bit int32 fold mul (limbfold.FieldOps.mul)
  3. an f32 9-bit-limb fold mul prototype (floor-based carries)
  4. pad-shift conv vs dynamic-slice accumulation inside the mul

Run on the TPU host:  python scripts/bench_mul_strategies.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def timeit(f, *args, n=7):
    jax.block_until_ready(f(*args))
    best = float("inf")
    for _ in range(n):
        t0 = time.monotonic()
        jax.block_until_ready(f(*args))
        best = min(best, time.monotonic() - t0)
    return best


def main():
    print("backend:", jax.default_backend())
    B = 1 << 12  # lanes
    n_i = 22  # int32 12-bit limbs (current)
    n_f = 30  # f32 9-bit limbs (candidate)

    # ---- 1. raw op-chain throughput --------------------------------------
    E = 1 << 20
    a32 = jnp.asarray(np.random.randint(-4096, 4096, (8, E // 8), np.int32))
    b32 = jnp.asarray(np.random.randint(-4096, 4096, (8, E // 8), np.int32))
    af, bf = a32.astype(jnp.float32), b32.astype(jnp.float32)

    def chain(a, b):
        x = a
        for _ in range(64):
            x = x * b + a
        return x

    ci = jax.jit(chain)
    dt = timeit(ci, a32, b32)
    print(f"int32 mul+add chain: {64*E/dt/1e9:8.1f} G MAC/s")
    dt = timeit(ci, af, bf)
    print(f"f32   fma     chain: {64*E/dt/1e9:8.1f} G MAC/s")

    # add-only chain (measures whether mul is the expensive half)
    def addchain(a, b):
        x = a
        for _ in range(64):
            x = x + b
        return x

    ca = jax.jit(addchain)
    dt = timeit(ca, a32, b32)
    print(f"int32 add     chain: {64*E/dt/1e9:8.1f} G add/s")

    # shift chain: pad on sublane axis (the conv's data movement)
    s32 = jnp.asarray(np.random.randint(-4096, 4096, (46, B), np.int32))

    def shiftchain(x):
        for _ in range(32):
            x = jnp.pad(x[:-1, :], ((1, 0), (0, 0))) + x
        return x

    cs = jax.jit(shiftchain)
    dt = timeit(cs, s32)
    print(f"sublane shift+add  : {32*46*B/dt/1e9:8.1f} G row-ops/s")

    # ---- 2. current int32 fold mul ---------------------------------------
    from libzkp_tpu.ops import ed25519 as ed
    from libzkp_tpu.ops.limbfold import FieldOps, get_fold_ctx

    ctx = get_fold_ctx(ed.P)
    consts = jnp.asarray(ctx.consts_block())
    f = FieldOps(ctx.n, consts)
    ai = jnp.asarray(np.random.randint(0, 4096, (16, ctx.n, B), np.int32))
    bi = jnp.asarray(np.random.randint(0, 4096, (16, ctx.n, B), np.int32))

    mul16 = jax.jit(lambda a, b: f._mul_impl(a, b))
    dt = timeit(mul16, ai, bi)
    r_i32 = 16 * B / dt
    print(f"int32 12b fold mul : {r_i32/1e6:8.1f} M fieldmul/s")

    # ---- 3. f32 prototype -------------------------------------------------
    # 9-bit limbs, n=30 (270 bits), floor carries. Same fold structure.
    W = 9
    nf = n_f
    p = ed.P

    def int_to_limbs_w(x, n, w):
        out = np.zeros(n, dtype=np.float32)
        m = (1 << w) - 1
        for i in range(n):
            out[i] = x & m
            x >>= w
        assert x == 0
        return out

    ONEf = int_to_limbs_w((1 << (W * nf)) % p, nf, W)
    FOLDf = np.stack(
        [int_to_limbs_w((1 << (W * (nf + i))) % p, nf, W) for i in range(nf + 2)]
    )
    onef = jnp.asarray(ONEf)[:, None]
    foldf = jnp.asarray(FOLDf)

    TWOW = float(1 << W)
    INV = 1.0 / TWOW

    def carry_f(x):
        hi = jnp.floor(x * INV)
        lo = x - hi * TWOW
        pad = [(0, 0)] * (x.ndim - 2) + [(1, 0), (0, 0)]
        return lo + jnp.pad(hi[..., :-1, :], pad) + hi[..., -1:, :] * onef

    def carry_nw_f(x):
        hi = jnp.floor(x * INV)
        lo = x - hi * TWOW
        pad = [(0, 0)] * (x.ndim - 2) + [(1, 0), (0, 0)]
        return lo + jnp.pad(hi[..., :-1, :], pad)

    def mul_f(a, b):
        NC = 2 * nf + 2
        nb = a.ndim - 2
        T = sum(
            jnp.pad(
                a * b[..., j : j + 1, :],
                [(0, 0)] * nb + [(j, NC - nf - j), (0, 0)],
            )
            for j in range(nf)
        )
        T = carry_nw_f(carry_nw_f(T))
        acc = T[..., :nf, :]
        for i in range(nf + 2):
            acc = acc + T[..., nf + i : nf + i + 1, :] * foldf[i][:, None]
        return carry_f(carry_f(carry_f(acc)))

    aF = jnp.asarray(np.random.randint(0, 512, (16, nf, B)).astype(np.float32))
    bF = jnp.asarray(np.random.randint(0, 512, (16, nf, B)).astype(np.float32))
    mulf16 = jax.jit(lambda a, b: mul_f(a, b))
    dt = timeit(mulf16, aF, bF)
    r_f32 = 16 * B / dt
    print(f"f32    9b fold mul : {r_f32/1e6:8.1f} M fieldmul/s  ({r_f32/r_i32:.2f}x)")

    # correctness spot-check of the f32 prototype
    import random

    rng = random.Random(7)
    xs = [rng.randrange(p) for _ in range(4)]
    ys = [rng.randrange(p) for _ in range(4)]
    A = jnp.asarray(
        np.stack([int_to_limbs_w(x, nf, W) for x in xs])[..., None]
    )  # (4, nf, 1)
    Bv = jnp.asarray(np.stack([int_to_limbs_w(y, nf, W) for y in ys])[..., None])
    out = np.asarray(jax.jit(mul_f)(A, Bv))[..., 0]
    for k, (x, y) in enumerate(zip(xs, ys)):
        got = sum(int(v) << (W * i) for i, v in enumerate(out[k].astype(np.int64))) % p
        assert got == x * y % p, f"f32 mul wrong at {k}"
    print("f32 prototype correct on 4 random products")

    # ---- 4. 16-bit-limb i32 conv with masked split ------------------------
    # products of 16b limbs overflow i32 when accumulated; split each limb
    # into (hi, lo) and do 4 half-convs — measures whether fewer, wider limbs
    # beat the op inflation.  n16 = 17 limbs of 16 bits = 272 bits.
    n16 = 17

    def mul_i16split(a_lo, a_hi, b_lo, b_hi):
        # conv of (a_lo + 2^8 a_hi) x (b_lo + 2^8 b_hi), all 8-bit pieces
        NC = 2 * n16 + 2
        nb = a_lo.ndim - 2

        def conv(x, y):
            return sum(
                jnp.pad(
                    x * y[..., j : j + 1, :],
                    [(0, 0)] * nb + [(j, NC - n16 - j), (0, 0)],
                )
                for j in range(n16)
            )

        return (
            conv(a_lo, b_lo)
            + (conv(a_lo, b_hi) + conv(a_hi, b_lo)) * 256
            + conv(a_hi, b_hi) * 65536
        )

    al = jnp.asarray(np.random.randint(0, 256, (16, n16, B), np.int32))
    ah = jnp.asarray(np.random.randint(0, 256, (16, n16, B), np.int32))
    m16 = jax.jit(lambda a, b, c, d: mul_i16split(a, b, c, d))
    dt = timeit(m16, al, ah, al, ah)
    print(f"i32 16b-split conv : {16*B/dt/1e6:8.1f} M conv/s (conv only, no carry)")


if __name__ == "__main__":
    main()
