#!/usr/bin/env python
"""Fetch-synced end-to-end + phase timing of the v2 MSM driver.

Usage: python scripts/bench_msm_v2.py [B]
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

B = int(sys.argv[1]) if len(sys.argv) > 1 else 512
K = 129


def fetch(f, *a, n_=5):
    float(np.asarray(jnp.sum(f(*a))))
    best = 1e9
    for _ in range(n_):
        t0 = time.monotonic()
        float(np.asarray(jnp.sum(f(*a))))
        best = min(best, time.monotonic() - t0)
    return best


def main():
    print(f"backend: {jax.default_backend()}  B={B}", flush=True)
    eng = cj.edwards_engine()
    C, n = eng.coords, eng.n
    pts = [ed.scalar_mul(3 + 2 * i, ed.BASEPOINT) for i in range(K)]
    table = cj.DeviceTable("ed25519", eng.encode_points(pts))
    Kp = table.Kp
    rng = np.random.default_rng(5)
    scal = [[int.from_bytes(rng.bytes(32), "little") % ed.L for _ in range(K)] for _ in range(B)]
    digits = jnp.asarray(cj._digits_from_scalars(scal, K, Kp))
    hiT, loT = table.table_int8

    floor = fetch(jax.jit(lambda x: x + 1), jnp.zeros((), jnp.int32))
    print(f"floor: {floor*1e3:.1f} ms", flush=True)

    packedT = table.table_int8_packed
    v4 = cj._msm_jit_v4("ed25519", Kp, B)
    dt = fetch(lambda d: v4(table.consts, packedT, d), digits) - floor
    print(f"v4 full  : {dt*1e3:8.2f} ms ({dt/B*1e3:.4f} ms/lane)", flush=True)

    v3 = cj._msm_jit_v3("ed25519", Kp, B)
    dt = fetch(lambda d: v3(table.consts, packedT, d), digits) - floor
    print(f"v3 full  : {dt*1e3:8.2f} ms ({dt/B*1e3:.4f} ms/lane)", flush=True)

    v2 = cj._msm_jit_v2("ed25519", Kp, B)
    dt = fetch(lambda d: v2(table.consts, hiT, loT, d), digits) - floor
    print(f"v2 full  : {dt*1e3:8.2f} ms ({dt/B*1e3:.4f} ms/lane)", flush=True)

    v1 = cj._msm_jit("ed25519", Kp, B)
    dt1 = fetch(lambda d: v1(table.consts, table.table, d), digits) - floor
    print(f"v1 full  : {dt1*1e3:8.2f} ms ({dt1/B*1e3:.4f} ms/lane)", flush=True)

    # wsum-only, fetch-synced
    wsum = cj._window_sum_call("ed25519", Kp, B)
    blk = jnp.asarray(rng.integers(-4096, 4096, (Kp, C, n, B)).astype(np.int32))

    @jax.jit
    def ws32(b):
        def step(acc, _):
            return acc + wsum(table.consts, b), None
        acc, _ = jax.lax.scan(step, jnp.zeros((C, n, B), jnp.int32), None, length=32)
        return acc

    dt = fetch(ws32, blk) - floor
    print(f"wsum x32 : {dt*1e3:8.2f} ms ({dt/32*1e3:.3f} ms/call)", flush=True)

    # mm-gather only
    iota = jnp.asarray(np.arange(256, dtype=np.int32)[None, :, None])
    dw = jax.jit(cj._digits_to_windows)(digits)

    @jax.jit
    def mm32(dw):
        def step(acc, dig):
            d = jnp.transpose(dig, (1, 0))[:, None, :]
            oh = (d == iota).astype(jnp.int8)
            def bmm(t8):
                return jax.lax.dot_general(
                    t8, oh, (((2,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.int32)
            p = (bmm(hiT) * 256 + bmm(loT))
            return acc + jnp.sum(p), None
        acc, _ = jax.lax.scan(step, jnp.int32(0), dw)
        return acc

    dt = fetch(mm32, dw) - floor
    print(f"mmgather : {dt*1e3:8.2f} ms", flush=True)

    # correctness vs host
    out = np.asarray(v4(table.consts, packedT, digits))
    got = cj._decode("ed25519", out, 2)
    for i in range(2):
        want = ed.msm_fixed(scal[i], pts)
        inv = pow(got[i][2], ed.P - 2, ed.P)
        winv = pow(want[2], ed.P - 2, ed.P)
        assert got[i][0] * inv % ed.P == want[0] * winv % ed.P
    print("v4 correct on 2 lanes", flush=True)


if __name__ == "__main__":
    main()
