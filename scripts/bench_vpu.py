#!/usr/bin/env python
"""Microbenchmark: raw VPU throughput for int32 vs f32 multiply-add, and
a mont_mul throughput probe, on the current backend."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def timeit(f, *args, n=5):
    f(*args)[0].block_until_ready() if isinstance(f(*args), tuple) else jax.block_until_ready(f(*args))
    best = float("inf")
    for _ in range(n):
        t0 = time.monotonic()
        jax.block_until_ready(f(*args))
        best = min(best, time.monotonic() - t0)
    return best


def main():
    print("backend:", jax.default_backend())
    E = 1 << 20
    n = 22

    a32 = jnp.asarray(np.random.randint(-4096, 4096, (E, n), np.int32))
    b32 = jnp.asarray(np.random.randint(-4096, 4096, (E, n), np.int32))
    af = a32.astype(jnp.float32)
    bf = b32.astype(jnp.float32)

    # int32 elementwise multiply chain (16 mults)
    @jax.jit
    def mul_i32(a, b):
        x = a
        for _ in range(16):
            x = x * b + a
        return x

    @jax.jit
    def mul_f32(a, b):
        x = a
        for _ in range(16):
            x = x * b + a
        return x

    dt = timeit(mul_i32, a32, b32)
    print(f"int32 mul+add: {16*E*n/dt/1e9:.1f} Gop/s  ({dt*1e3:.2f} ms)")
    dt = timeit(mul_f32, af, bf)
    print(f"f32   mul+add: {16*E*n/dt/1e9:.1f} Gop/s  ({dt*1e3:.2f} ms)")

    # mont_mul throughput on (E, n) arrays
    from libzkp_tpu.ops.limb import get_context
    from libzkp_tpu.ops import ed25519 as ed

    ctx = get_context(ed.P)
    mm = jax.jit(ctx.mont_mul)
    dt = timeit(mm, a32, b32)
    print(f"mont_mul: {E/dt/1e6:.1f} M fieldmul/s ({dt*1e3:.2f} ms for 2^20)")

    # batched point add throughput
    from libzkp_tpu.ops import curve_jax as cj

    eng = cj.edwards_engine()
    E2 = 1 << 18
    p = jnp.asarray(np.random.randint(-4096, 4096, (E2, 4, ctx.n), np.int32))
    q = jnp.asarray(np.random.randint(-4096, 4096, (E2, 4, ctx.n), np.int32))
    padd = jax.jit(eng.add)
    dt = timeit(padd, p, q)
    print(f"point add: {E2/dt/1e6:.2f} M adds/s ({dt*1e3:.2f} ms for 2^18)")


if __name__ == "__main__":
    main()
