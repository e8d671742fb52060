#!/usr/bin/env python
"""Probe: mont_mul with limbs on the sublane axis (batch on lanes) vs the
current limbs-on-lanes layout."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def timeit(f, *args, n=5):
    jax.block_until_ready(f(*args))
    best = float("inf")
    for _ in range(n):
        t0 = time.monotonic()
        jax.block_until_ready(f(*args))
        best = min(best, time.monotonic() - t0)
    return best


def main():
    print("backend:", jax.default_backend())
    from libzkp_tpu.ops import ed25519 as ed
    from libzkp_tpu.ops.limb import LIMB_MASK, get_context

    ctx = get_context(ed.P)
    n = ctx.n
    E = 1 << 20

    rng = np.random.randint(-4096, 4096, (2, E, n), np.int32)
    a = jnp.asarray(rng[0])
    b = jnp.asarray(rng[1])
    aT = jnp.asarray(np.ascontiguousarray(rng[0].T))  # (n, E)
    bT = jnp.asarray(np.ascontiguousarray(rng[1].T))

    mm = jax.jit(ctx.mont_mul)
    dt = timeit(mm, a, b)
    print(f"current (E,n) mont_mul:   {E/dt/1e6:7.1f} M/s ({dt*1e3:.2f} ms)")

    p_limbs = jnp.asarray(np.asarray(ctx.p_limbs))  # (n,)
    one_mont = jnp.asarray(np.asarray(ctx.one_mont))
    ninv = jnp.int32(ctx.ninv)

    def carry_T(x):  # (..., nl, E)
        lo = x & LIMB_MASK
        hi = x >> 12
        hi_shift = jnp.pad(hi[..., :-1, :], [(0, 0)] * (x.ndim - 2) + [(1, 0), (0, 0)])
        wrap = hi[..., -1:, :]
        return lo + hi_shift + wrap * one_mont[:, None]

    def relax_T(x):
        return carry_T(carry_T(carry_T(x)))

    def mont_mul_T(a, b):  # (n, E)
        T = sum(
            jnp.pad(a * b[j : j + 1, :], [(j, n - j), (0, 0)]) for j in range(n)
        )
        for i in range(n):
            m = ((T[i, :] & LIMB_MASK) * ninv) & LIMB_MASK
            T = T.at[i : i + n, :].add(m[None, :] * p_limbs[:, None])
            T = T.at[i + 1, :].add(T[i, :] >> 12)
        return relax_T(T[n : 2 * n, :])

    mmT = jax.jit(mont_mul_T)
    dt = timeit(mmT, aT, bT)
    print(f"transposed (n,E) mont_mul: {E/dt/1e6:7.1f} M/s ({dt*1e3:.2f} ms)")

    # correctness
    got = np.asarray(mmT(aT, bT)).T
    want = np.asarray(mm(a, b))
    from libzkp_tpu.ops.limb import _limbs_to_int

    for i in range(0, E, E // 7):
        x = _limbs_to_int(got[i]) % ctx.p
        y = _limbs_to_int(want[i]) % ctx.p
        assert x == y, i
    print("match: True")

    # also: (tiles, n, 128) 3-D variant
    a3 = jnp.asarray(rng[0].reshape(E // 128, 128, n).transpose(0, 2, 1))
    b3 = jnp.asarray(rng[1].reshape(E // 128, 128, n).transpose(0, 2, 1))

    def mont_mul_3(a, b):  # (t, n, 128)
        T = sum(
            jnp.pad(a * b[:, j : j + 1, :], [(0, 0), (j, n - j), (0, 0)])
            for j in range(n)
        )
        for i in range(n):
            m = ((T[:, i, :] & LIMB_MASK) * ninv) & LIMB_MASK
            T = T.at[:, i : i + n, :].add(m[:, None, :] * p_limbs[None, :, None])
            T = T.at[:, i + 1, :].add(T[:, i, :] >> 12)
        return relax_T(T[:, n : 2 * n, :])

    mm3 = jax.jit(mont_mul_3)
    dt = timeit(mm3, a3, b3)
    print(f"3-D (t,n,128) mont_mul:    {E/dt/1e6:7.1f} M/s ({dt*1e3:.2f} ms)")


if __name__ == "__main__":
    main()
