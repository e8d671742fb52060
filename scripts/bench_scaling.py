#!/usr/bin/env python
"""Multi-device scaling harness on the virtual CPU mesh (1/2/4/8 devices).

Measures the library's sharded batch paths — dp-sharded MiMC commitments
(:func:`libzkp_tpu.ops.mimc.mimc_hash_batch`) and the dp-sharded f128 coset
LDE (:func:`libzkp_tpu.ops.ntt.coset_lde_batch` building block) — at mesh
sizes 1/2/4/8 and reports per-device throughput + scaling efficiency vs the
1-device baseline (BASELINE.json "≥80% scaling efficiency at N≥2" target).

NOTE: the virtual CPU mesh validates the *sharded program* (layouts,
collectives, SPMD partitioning), but all N virtual devices share this host's
physical cores — wall-clock efficiency here is bounded by core count, not by
ICI. On real multi-chip hardware each mesh device is a physical chip. Run:

    python scripts/bench_scaling.py [batch]
"""

import json
import os
import sys
import time

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def bench(fn, reps=5):
    fn()  # compile
    best = float("inf")
    for _ in range(reps):
        t0 = time.monotonic()
        fn()
        best = min(best, time.monotonic() - t0)
    return best


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 4096

    import jax
    import numpy as np
    from jax.sharding import Mesh

    from libzkp_tpu.ops.mimc import mimc_hash_batch
    from libzkp_tpu.ops.ntt import coset_lde_batch
    from libzkp_tpu.ops.field import F128

    devices = jax.devices("cpu")
    assert len(devices) >= 8, "need XLA_FLAGS=--xla_force_host_platform_device_count=8"

    values = list(range(1, batch + 1))
    traces = [[(7 * i + j) % F128.p for j in range(8)] for i in range(256)]

    from libzkp_tpu.ops.ntt import ntt_sharded

    ntt_vals = [(i * 7919 + 13) % F128.p for i in range(4096)]

    results = {}
    base = None
    for nd in (1, 2, 4, 8):
        mesh = Mesh(np.asarray(devices[:nd]).reshape(nd, 1), ("dp", "shard"))
        t_mimc = bench(lambda: mimc_hash_batch(values, mesh=mesh))
        t_lde = bench(lambda: coset_lde_batch(F128.p, traces, 8, 3, mesh=mesh))
        row = {
            "mimc_per_s": round(batch / t_mimc, 1),
            "lde_per_s": round(256 / t_lde, 1),
        }
        if nd >= 2:
            # intra-NTT sharding: ONE 4096-point transform split across the
            # `shard` axis (four-step all_to_all butterfly, ops/ntt.py)
            mesh_sh = Mesh(
                np.asarray(devices[:nd]).reshape(1, nd), ("dp", "shard")
            )
            t_ntt = bench(lambda: ntt_sharded(F128.p, ntt_vals, mesh_sh))
            row["sharded_ntt_ms"] = round(t_ntt * 1e3, 1)
        if nd == 1:
            base = row
        row["mimc_eff"] = round(row["mimc_per_s"] / (base["mimc_per_s"] * nd), 3)
        row["lde_eff"] = round(row["lde_per_s"] / (base["lde_per_s"] * nd), 3)
        results[nd] = row
        print(nd, json.dumps(row), flush=True)

    print(json.dumps({"scaling": results}))


if __name__ == "__main__":
    main()
