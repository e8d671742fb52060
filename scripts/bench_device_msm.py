#!/usr/bin/env python
"""Microbenchmark: device windowed MSM vs the native CPU tier.

Usage: python scripts/bench_device_msm.py [B] [K] [curve]
"""

import os
import random
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

random.seed(7)


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    K = int(sys.argv[2]) if len(sys.argv) > 2 else 129
    curve = sys.argv[3] if len(sys.argv) > 3 else "ed25519"

    import jax

    print("backend:", jax.default_backend())

    from libzkp_tpu.ops import msm_device

    msm_device.configure_jax()

    from libzkp_tpu.ops import curve_jax as cj

    if curve == "ed25519":
        from libzkp_tpu.ops import ed25519 as ed

        pts = [ed.from_uniform_bytes(random.randbytes(64)) for _ in range(K)]
        order = ed.L
        t0 = time.monotonic()
        table = cj.build_table_ed25519(pts)
        print(f"table build: {time.monotonic()-t0:.2f}s")
        host_many = lambda vecs: ed.msm_fixed_many(vecs, pts)
        check = lambda a, b: ed.point_equal(a, b)
    else:
        from libzkp_tpu.ops import bn254 as bn

        g = bn.g1_from_affine(bn.G1_GEN)
        pts = [bn.g1_scalar_mul(random.randrange(bn.R), g) for _ in range(K)]
        order = bn.R
        t0 = time.monotonic()
        table = cj.build_table_bn254_g1(pts)
        print(f"table build: {time.monotonic()-t0:.2f}s")
        host_many = lambda vecs: bn.g1_msm_fixed_many(vecs, pts)
        check = lambda a, b: bn.g1_to_affine(a) == bn.g1_to_affine(b)

    vecs = [[random.randrange(order) for _ in range(K)] for _ in range(B)]

    # device: warm-up (compile) then timed
    t0 = time.monotonic()
    got = cj.msm_many(table, vecs)
    print(f"device first call (compile+run): {time.monotonic()-t0:.2f}s")
    for _ in range(3):
        t0 = time.monotonic()
        got = cj.msm_many(table, vecs)
        dt = time.monotonic() - t0
        print(f"device msm_many: {dt*1e3:.1f} ms  ({B/dt:.0f} MSMs/s)")

    # phase breakdown
    import jax.numpy as jnp
    import numpy as np

    t0 = time.monotonic()
    digits = cj._digits_from_scalars(vecs, table.K, table.Kp)
    Bp = cj._pad_batch(B)
    if Bp != B:
        digits = np.pad(digits, ((0, 0), (0, Bp - B), (0, 0)))
    t_prep = time.monotonic() - t0
    dj = jnp.asarray(digits)
    run = cj._msm_jit(table.curve, table.Kp, Bp)
    out = run(table.consts, table.table, dj)
    np.asarray(out.ravel()[:4])
    best = 1e9
    for _ in range(3):
        t0 = time.monotonic()
        out = run(table.consts, table.table, dj)
        np.asarray(out.ravel()[:4])
        best = min(best, time.monotonic() - t0)
    t0 = time.monotonic()
    out_np = np.asarray(out)
    _ = cj._decode(table.curve, out_np, B)
    t_dec = time.monotonic() - t0
    print(f"phases: prep {t_prep*1e3:.1f} ms | jit+RTT {best*1e3:.1f} ms | decode {t_dec*1e3:.1f} ms")

    # host native
    for _ in range(3):
        t0 = time.monotonic()
        want = host_many(vecs)
        dt = time.monotonic() - t0
        print(f"host msm_fixed_many: {dt*1e3:.1f} ms  ({B/dt:.0f} MSMs/s)")

    ok = all(check(a, b) for a, b in zip(got, want))
    print("match:", ok)
    assert ok


if __name__ == "__main__":
    main()
