#!/usr/bin/env python
"""Prototype: MSM window gather as an int8 one-hot MXU batched matmul.

Phase decomposition (bench_msm_phases.py, fetch-synced) showed the radix-256
window gather costs ~55 ms of the ~110 ms device MSM at (K=129, B=512) —
XLA's gather fetches 176-byte rows at ~4 GB/s, latency-bound. The MXU can do
the same selection as a batched matmul:

    pts[k, :, b] = table[k, :, :] @ onehot[k, :, b]

with table (Kp, 88, 256) int8-split and onehot (Kp, 256, B) int8 — output
lands directly in the kernel's (Kp, C, n, B) layout (no transpose), int32
accumulation is exact, and table limbs split into (hi, lo) int8 halves.

Timing discipline: N-iteration scan + ONE scalar fetch; subtract the fetch
floor; divide by N.
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

B, K = 512, 129
NWIN = 32


def fetch_time(f, *args, n=5):
    """Steady-state per-call seconds, synced by fetching the scalar output."""
    float(np.asarray(f(*args)))  # warm/compile
    best = float("inf")
    for _ in range(n):
        t0 = time.monotonic()
        float(np.asarray(f(*args)))
        best = min(best, time.monotonic() - t0)
    return best


def main():
    print("backend:", jax.default_backend(), flush=True)
    eng = cj.edwards_engine()
    C, n = eng.coords, eng.n  # 4, 22
    CN = C * n  # 88

    pts = [ed.scalar_mul(3 + 2 * i, ed.BASEPOINT) for i in range(K)]
    table = cj.DeviceTable("ed25519", eng.encode_points(pts))
    Kp = table.Kp
    rng = np.random.default_rng(5)
    scal = [[int.from_bytes(rng.bytes(32), "little") % ed.L for _ in range(K)] for _ in range(B)]
    digits = cj._digits_from_scalars(scal, K, Kp)
    dw = jax.jit(cj._digits_to_windows)(jnp.asarray(digits))  # (32, B, Kp)

    # fetch floor
    z = jnp.zeros((), jnp.int32)
    t0 = time.monotonic()
    for _ in range(3):
        float(np.asarray(jax.jit(lambda x: x + 1)(z)))
    floor = (time.monotonic() - t0) / 3
    print(f"scalar fetch floor: {floor*1e3:.1f} ms", flush=True)

    # --- baseline: take-gather, 32 windows ---------------------------------
    tbl = table.table  # (Kp*256, C, n) int16
    koff = (jnp.arange(Kp, dtype=jnp.int32) * 256)[None, :]

    @jax.jit
    def gather_take(dw):
        def step(acc, dig):
            p = jnp.take(tbl, dig + koff, axis=0)
            p = jnp.transpose(p, (1, 2, 3, 0)).astype(jnp.int32)
            return acc + jnp.sum(p), None

        acc, _ = jax.lax.scan(step, jnp.int32(0), dw)
        return acc

    dt = fetch_time(gather_take, dw) - floor
    print(f"take gather+tr x32 : {dt*1e3:9.2f} ms", flush=True)

    # --- int8 one-hot matmul gather ----------------------------------------
    # table reshaped (Kp, 256, C*n) int16 -> hi/lo int8 as (Kp, C*n, 256)
    tnp = np.asarray(tbl).reshape(Kp, 256, CN).astype(np.int32)
    lo = ((tnp + 128) & 255) - 128
    hi = (tnp - lo) >> 8
    assert np.abs(hi).max() < 128
    loT = jnp.asarray(np.transpose(lo, (0, 2, 1)).astype(np.int8))  # (Kp, CN, 256)
    hiT = jnp.asarray(np.transpose(hi, (0, 2, 1)).astype(np.int8))
    iota = jnp.arange(256, dtype=jnp.int32)[None, :, None]  # (1, 256, 1)

    def matgather(dig):
        # dig (B, Kp) -> one-hot (Kp, 256, B) int8
        d = jnp.transpose(dig, (1, 0))[:, None, :]  # (Kp, 1, B)
        oh = (d == iota).astype(jnp.int8)
        def bmm(t8):
            return jax.lax.dot_general(
                t8, oh,
                dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.int32,
            )  # (Kp, CN, B)
        return bmm(hiT) * 256 + bmm(loT)

    @jax.jit
    def gather_mm(dw):
        def step(acc, dig):
            p = matgather(dig).reshape(Kp, C, n, B)
            return acc + jnp.sum(p), None

        acc, _ = jax.lax.scan(step, jnp.int32(0), dw)
        return acc

    dt = fetch_time(gather_mm, dw) - floor
    print(f"int8 matmul gather : {dt*1e3:9.2f} ms", flush=True)

    # correctness: window 0 matches the take path
    @jax.jit
    def one_take(dig):
        p = jnp.take(tbl, dig + koff, axis=0)
        return jnp.transpose(p, (1, 2, 3, 0)).astype(jnp.int32)

    @jax.jit
    def one_mm(dig):
        return matgather(dig).reshape(Kp, C, n, B)

    a = np.asarray(one_take(dw[0]))
    b = np.asarray(one_mm(dw[0]))
    assert (a == b).all(), f"mismatch: {np.abs(a-b).max()}"
    print("matmul gather bit-exact vs take", flush=True)

    # --- fused: matmul gather + window-sum kernel + horner (full MSM) ------
    wsum = cj._window_sum_call("ed25519", Kp, B)
    horner = cj._horner_call("ed25519", B)
    ident = np.broadcast_to(eng.identity_np()[..., None], (C, n, B))

    @jax.jit
    def full_mm(dw):
        def step(acc, dig):
            p = matgather(dig).reshape(Kp, C, n, B)
            w = wsum(table.consts, p)
            return horner(table.consts, acc, w), None

        acc, _ = jax.lax.scan(step, jnp.asarray(ident), dw)
        return jnp.sum(acc)

    dt = fetch_time(full_mm, dw) - floor
    print(f"full msm (mm path) : {dt*1e3:9.2f} ms  ({dt/B*1e3:.4f} ms/lane)", flush=True)

    # compare against production full path
    @jax.jit
    def full_take(dw):
        def step(acc, dig):
            p = jnp.take(tbl, dig + koff, axis=0)
            p = jnp.transpose(p, (1, 2, 3, 0))
            w = wsum(table.consts, p)
            return horner(table.consts, acc, w), None

        acc, _ = jax.lax.scan(step, jnp.asarray(ident), dw)
        return jnp.sum(acc)

    dt = fetch_time(full_take, dw) - floor
    print(f"full msm (take)    : {dt*1e3:9.2f} ms  ({dt/B*1e3:.4f} ms/lane)", flush=True)

    # full-result correctness vs host on 2 lanes
    out = None

    @jax.jit
    def full_mm_out(dw):
        def step(acc, dig):
            p = matgather(dig).reshape(Kp, C, n, B)
            w = wsum(table.consts, p)
            return horner(table.consts, acc, w), None

        acc, _ = jax.lax.scan(step, jnp.asarray(ident), dw)
        return acc

    out = np.asarray(full_mm_out(dw))
    got = cj._decode("ed25519", out, 2)
    for i in range(2):
        want = ed.msm_fixed(scal[i], pts)
        inv = pow(got[i][2], ed.P - 2, ed.P)
        winv = pow(want[2], ed.P - 2, ed.P)
        assert got[i][0] * inv % ed.P == want[0] * winv % ed.P, f"lane {i} X"
        assert got[i][1] * inv % ed.P == want[1] * winv % ed.P, f"lane {i} Y"
    print("full mm-path MSM correct on 2 lanes", flush=True)


if __name__ == "__main__":
    main()
