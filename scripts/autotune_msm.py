#!/usr/bin/env python
"""Measure the device-vs-host MSM crossover and record it for dispatch.

The prove path's device-MSM seam (``libzkp_tpu/ops/msm_device.py``) only
engages shape classes this script has measured as device wins on this
machine — engaging blind cost round 2 a ~3-minute XLA compile per shape
over the TPU tunnel plus a warm-throughput loss (see BASELINE.md "Device
MSM engine"). Run this once per machine (the XLA compile cache keeps the
compiles amortized); it times the host tier against the warmed device tier
at the production shape classes and writes the verdicts to
``~/.cache/libzkp_tpu/msm_autotune.json`` (override: LIBZKP_MSM_TUNE_FILE).

Usage: python scripts/autotune_msm.py [--quick]
"""

from __future__ import annotations

import argparse
import os
import secrets
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.cache/libzkp_tpu/jax")
)


def _bench(fn, reps=3):
    best = float("inf")
    for _ in range(reps):
        t0 = time.monotonic()
        fn()
        best = min(best, time.monotonic() - t0)
    return best


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true", help="ed25519 shapes only")
    args = ap.parse_args()

    from libzkp_tpu.ops import curve_jax as cj, msm_device
    from libzkp_tpu.models.bp_generators import bp_gens, pedersen_gens
    from libzkp_tpu.ops import ed25519 as ed

    msm_device.configure_jax()

    shapes = []  # (curve, basis builder, host runner)

    B_pt, B_bl = pedersen_gens()
    G, H = bp_gens(64)
    bp_basis = [B_bl] + list(G) + list(H)  # the bulletproofs A/S basis, K=129
    shapes.append(
        ("ed25519", bp_basis, cj.build_table_ed25519,
         lambda vecs: ed.msm_fixed_many(vecs, bp_basis), ed.L)
    )

    if not args.quick:
        from libzkp_tpu.models.snark_backend import _get_equality_setup
        from libzkp_tpu.ops import bn254 as bn

        pk = _get_equality_setup()
        shapes.append(
            ("bn254_g1", pk.h_query, cj.build_table_bn254_g1,
             lambda vecs: bn.g1_msm_fixed_many(vecs, pk.h_query), bn.R)
        )

    entries = {}
    for curve, basis, build, host_run, order in shapes:
        K = len(basis)
        for B in (256, 512):
            vecs = [
                [secrets.randbelow(order) for _ in range(K)] for _ in range(B)
            ]
            # host (exclude the one-time table registration from timing)
            prev = os.environ.get("LIBZKP_DEVICE_MSM")
            os.environ["LIBZKP_DEVICE_MSM"] = "0"
            try:
                host_run(vecs[:2])
                host_s = _bench(lambda: host_run(vecs))
            finally:
                if prev is None:
                    os.environ.pop("LIBZKP_DEVICE_MSM", None)
                else:
                    os.environ["LIBZKP_DEVICE_MSM"] = prev
            # device (pay the compile explicitly, then time warm)
            print(f"[{curve} K={K} B={B}] host {host_s/B*1e3:.3f} ms/lane; "
                  "compiling device path ...", flush=True)
            t0 = time.monotonic()
            table = build(list(basis))
            cj.msm_many(table, vecs)
            compile_s = time.monotonic() - t0
            dev_s = _bench(lambda: cj.msm_many(table, vecs))
            key = msm_device.shape_key(curve, K, B)
            wins = dev_s < host_s
            entries[key] = {
                "host_ms_per_lane": round(host_s / B * 1e3, 4),
                "device_ms_per_lane": round(dev_s / B * 1e3, 4),
                "first_compile_s": round(compile_s, 1),
                "wins": wins,
            }
            print(f"[{key}] host {host_s/B*1e3:.3f} vs device "
                  f"{dev_s/B*1e3:.3f} ms/lane (compile {compile_s:.0f}s) -> "
                  f"{'DEVICE' if wins else 'HOST'}", flush=True)

    msm_device.save_tune(entries)
    print(f"wrote {len(entries)} entries to {msm_device.tune_path()}")


if __name__ == "__main__":
    main()
