#!/usr/bin/env python
"""Decompose the device MSM batch into phases and time each on the chip.

bench_pallas_padd.py showed the padd arithmetic alone runs at ~2.5 ns/padd/
lane (0.014 ms/lane for a full K=129 MSM) while the production engine
measures ~0.32 ms/lane — the budget is in the glue. This isolates:

  1. full production _msm_jit (warm)            <- the number to beat
  2. digit transpose + flip only
  3. per-window gather (take) only
  4. gather + transpose only
  5. window-sum kernel only, on resident pre-gathered blocks
  6. horner kernel only
  7. minor-axis gather variant: table stored (C, n, K*256), take on last axis
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from libzkp_tpu.ops import curve_jax as cj
from libzkp_tpu.ops import ed25519 as ed

B = 512
K = 129


def timeit(f, *args, n=5):
    jax.block_until_ready(f(*args))
    best = float("inf")
    for _ in range(n):
        t0 = time.monotonic()
        jax.block_until_ready(f(*args))
        best = min(best, time.monotonic() - t0)
    return best


def main():
    print("backend:", jax.default_backend(), flush=True)
    eng = cj.edwards_engine()
    C, n = eng.coords, eng.n

    pts = [ed.scalar_mul(3 + 2 * i, ed.BASEPOINT) for i in range(K)]
    table = cj.DeviceTable("ed25519", eng.encode_points(pts))
    Kp = table.Kp
    rng = np.random.default_rng(5)
    scal = [[int.from_bytes(rng.bytes(32), 'little') % ed.L for _ in range(K)] for _ in range(B)]
    digits = cj._digits_from_scalars(scal, K, Kp)
    dig_j = jnp.asarray(digits)
    consts = table.consts
    tbl = table.table  # (Kp*256, C, n) int16

    # 1. full production
    run = cj._msm_jit("ed25519", Kp, B)
    dt = timeit(lambda d: run(consts, tbl, d), dig_j)
    print(f"1 full msm        : {dt*1e3:9.2f} ms  ({dt/B*1e3:.3f} ms/lane)", flush=True)

    # 2. digits transpose
    f2 = jax.jit(lambda d: cj._digits_to_windows(d))
    dt = timeit(f2, dig_j)
    print(f"2 digit windows   : {dt*1e3:9.2f} ms", flush=True)

    koff = (jnp.arange(Kp, dtype=jnp.int32) * 256)[None, :]
    dw = jax.jit(cj._digits_to_windows)(dig_j)  # (32, B, Kp)

    # 3. gather only (all 32 windows, summed to force evaluation)
    @jax.jit
    def gather_all(dw):
        def step(acc, dig):
            pts = jnp.take(tbl, dig + koff, axis=0)  # (B, Kp, C, n) int16
            return acc + jnp.sum(pts.astype(jnp.int32)), None

        acc, _ = jax.lax.scan(step, jnp.int32(0), dw)
        return acc

    dt = timeit(gather_all, dw)
    print(f"3 gather only     : {dt*1e3:9.2f} ms", flush=True)

    # 4. gather + transpose
    @jax.jit
    def gather_tr(dw):
        def step(acc, dig):
            pts = jnp.take(tbl, dig + koff, axis=0)
            pts = jnp.transpose(pts, (1, 2, 3, 0))
            return acc + jnp.sum(pts.astype(jnp.int32)), None

        acc, _ = jax.lax.scan(step, jnp.int32(0), dw)
        return acc

    dt = timeit(gather_tr, dw)
    print(f"4 gather+transpose: {dt*1e3:9.2f} ms", flush=True)

    # 5. window-sum kernel alone on resident data (32 iterations)
    wsum = cj._window_sum_call("ed25519", Kp, B)
    blk = jnp.asarray(
        rng.integers(-4096, 4096, (Kp, C, n, B)).astype(np.int16)
    )

    @jax.jit
    def wsum32(blk):
        def step(acc, _):
            return acc + wsum(consts, blk), None

        acc, _ = jax.lax.scan(step, jnp.zeros((C, n, B), jnp.int32), None, length=32)
        return acc

    dt = timeit(wsum32, blk)
    print(f"5 window-sum x32  : {dt*1e3:9.2f} ms", flush=True)

    # 6. horner x32
    horner = cj._horner_call("ed25519", B)
    acc0 = jnp.asarray(rng.integers(-4096, 4096, (C, n, B)).astype(np.int32))
    w0 = jnp.asarray(rng.integers(-4096, 4096, (C, n, B)).astype(np.int32))

    @jax.jit
    def horner32(acc, w):
        def step(a, _):
            return horner(consts, a, w), None

        a, _ = jax.lax.scan(step, acc, None, length=32)
        return a

    dt = timeit(horner32, acc0, w0)
    print(f"6 horner x32      : {dt*1e3:9.2f} ms", flush=True)

    # 7. minor-axis gather: table (C, n, Kp*256) int16, take on last axis
    tblT = jnp.asarray(np.transpose(np.asarray(tbl), (1, 2, 0)).copy())

    @jax.jit
    def gather_minor(dw):
        def step(acc, dig):
            # dig (B, Kp) -> indices (Kp, B)
            idx = (dig + koff).T  # (Kp, B)
            pts = jnp.take(tblT, idx.reshape(-1), axis=-1)  # (C, n, Kp*B)
            pts = pts.reshape(C, n, Kp, B)
            pts = jnp.transpose(pts, (2, 0, 1, 3))  # major-only transpose
            return acc + jnp.sum(pts.astype(jnp.int32)), None

        acc, _ = jax.lax.scan(step, jnp.int32(0), dw)
        return acc

    dt = timeit(gather_minor, dw)
    print(f"7 minor gather    : {dt*1e3:9.2f} ms", flush=True)


if __name__ == "__main__":
    main()
