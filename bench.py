#!/usr/bin/env python
"""Benchmark driver hook: prints ONE JSON line.

Headline (BASELINE.md): improvement-proof (STARK) throughput through the
library's own batch path (``process_batch``). The default route is the
native whole-pipeline prover (zkpcore.cpp, OMP across the batch, byte-exact
with the Python/winterfell-container model); the TPU NTT engine's batched
LDE path remains measured separately in ``extra`` (the
``stark_trace_ldes_per_sec_batched`` entry exercises it directly). Compared
against the reference's ~15 ms/proof single-core number
(reference README.md:330).

``extra`` carries the full picture: per-type single-proof latencies on the
reference's canonical workloads (advanced/mod.rs:93-103), the mixed-batch
throughput, parallel verification throughput, and the TPU-batched MiMC
commitment rate.
"""

from __future__ import annotations

import json
import os
import sys
import time

# NEVER strip or overwrite PYTHONPATH here: on tunneled-TPU hosts it points
# at the sitecustomize that registers the PJRT plugin (losing it leaves
# JAX_PLATFORMS naming an unregistered backend and jax lands on CPU).
# In-process sys.path additions are harmless — the plugin registered at
# interpreter startup.
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# Persistent XLA compilation cache: first-ever run on a machine pays the
# tunnel compiles once; every later run (including this driver's) hits disk.
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.cache/libzkp_tpu/jax")
)

# Leave JAX_PLATFORMS exactly as the caller set it: the platform's plugin
# registration happens via the environment's own sitecustomize.


def _bench_ms(fn, n=8):
    best = float("inf")
    for _ in range(n):
        t0 = time.monotonic()
        fn()
        best = min(best, time.monotonic() - t0)
    return round(best * 1e3, 2)


def main() -> None:
    # Initialize the jax backend ONCE, first, on the main thread: the prove
    # paths consult device gates from worker threads, and a backend init
    # that first happens there can fail and be process-cached, silently
    # demoting every later device section to CPU/skip.
    try:
        import jax

        jax.devices()
    except Exception:
        pass

    import libzkp_tpu.api as zkp
    from libzkp_tpu.ops.mimc import mimc_hash_batch

    # -- warm-up: provers, setups, fixed-base tables, device compiles -------
    zkp.prove_range(50, 0, 100)
    zkp.prove_equality(42, 42)
    zkp.prove_threshold([10, 20, 30, 40], 50)
    zkp.prove_membership(25, [10, 20, 25, 30, 40])
    zkp.prove_improvement(30, 50)
    zkp.prove_consistency([10, 20, 30, 40, 50])

    # -- headline: improvement proofs/sec through the batch path ------------
    # 256 ops: at this size the library's default thresholds engage the
    # device LDE path. One untimed warm-up batch absorbs the (disk-cached)
    # XLA compile; best of 3 timed runs — this host is a VM with double-digit
    # CPU-steal spikes, so a single timed run can under-report by 2x.
    n = 256
    pps = 0.0
    proofs = []
    for rep in range(4):
        bid = zkp.create_proof_batch()
        for i in range(n):
            zkp.batch_add_improvement_proof(bid, 30, 50 + (i % 50))
        t0 = time.monotonic()
        proofs = zkp.process_batch(bid)
        gen_s = time.monotonic() - t0
        assert len(proofs) == n
        if rep:
            pps = max(pps, len(proofs) / gen_s)

    # verification through the library's batch-verify surface (the rayon
    # parallel-verify analogue, performance.rs:246-294)
    ver_pps = 0.0
    vpairs = [(p, "improvement") for p in proofs]
    for _ in range(2):
        t0 = time.monotonic()
        flags = zkp.verify_proofs_parallel(vpairs)
        ver_pps = max(ver_pps, n / (time.monotonic() - t0))
        assert all(flags), "benchmark proofs failed to verify"

    # -- per-type single-proof latencies (canonical workloads) --------------
    lat = {}
    lat["range_prove_ms"] = _bench_ms(lambda: zkp.prove_range(50, 0, 100))
    pr = zkp.prove_range(50, 0, 100)
    lat["range_verify_ms"] = _bench_ms(lambda: zkp.verify_range(pr, 0, 100))
    # The canonical workloads repeat one statement (advanced/mod.rs:93-103),
    # which the witness-accumulator memo serves after the first prove; the
    # _distinct variants cycle fresh statements so both regimes are visible.
    lat["equality_prove_ms"] = _bench_ms(lambda: zkp.prove_equality(42, 42), 5)
    eq_i = [0]

    def _eq_distinct():
        eq_i[0] += 1
        zkp.prove_equality(1000 + eq_i[0], 1000 + eq_i[0])

    lat["equality_prove_distinct_ms"] = _bench_ms(_eq_distinct, 5)
    pe = zkp.prove_equality(42, 42)
    lat["equality_verify_ms"] = _bench_ms(lambda: zkp.verify_equality(pe, 42, 42), 5)
    lat["threshold_prove_ms"] = _bench_ms(lambda: zkp.prove_threshold([10, 20, 30, 40], 50), 5)
    lat["membership_prove_ms"] = _bench_ms(
        lambda: zkp.prove_membership(25, [10, 20, 25, 30, 40]), 5
    )
    mem_i = [0]

    def _mem_distinct():
        mem_i[0] += 1
        v = 2000 + mem_i[0]
        zkp.prove_membership(v, [v - 1, v, v + 1, v + 2, v + 3])

    lat["membership_prove_distinct_ms"] = _bench_ms(_mem_distinct, 5)
    lat["improvement_prove_ms"] = _bench_ms(lambda: zkp.prove_improvement(30, 50))
    lat["consistency_prove_ms"] = _bench_ms(
        lambda: zkp.prove_consistency([10, 20, 30, 40, 50]), 5
    )

    # -- mixed batch (canonical mix, BASELINE config #5 scaled down) --------
    mixed_pps = 0.0
    mixed = []
    for _ in range(2):
        bid = zkp.create_proof_batch()
        for i in range(20):
            zkp.batch_add_range_proof(bid, 50, 0, 100)
            zkp.batch_add_equality_proof(bid, 42, 42)
            zkp.batch_add_threshold_proof(bid, [10, 20, 30, 40], 50)
            zkp.batch_add_membership_proof(bid, 25, [10, 20, 25, 30, 40])
            zkp.batch_add_improvement_proof(bid, 30, 50)
            zkp.batch_add_consistency_proof(bid, [10, 20, 30, 40, 50])
        t0 = time.monotonic()
        mixed = zkp.process_batch(bid)
        mixed_pps = max(mixed_pps, len(mixed) / (time.monotonic() - t0))

    # -- full 1020-op mixed batch (BASELINE config #5: the >=10x target is
    # defined on a ~1024-proof mixed batch vs single-core Rust) -------------
    mixed1020_pps = 0.0
    for _ in range(2):
        bid = zkp.create_proof_batch()
        for i in range(170):
            zkp.batch_add_range_proof(bid, 50, 0, 100)
            zkp.batch_add_equality_proof(bid, 42, 42)
            zkp.batch_add_threshold_proof(bid, [10, 20, 30, 40], 50)
            zkp.batch_add_membership_proof(bid, 25, [10, 20, 25, 30, 40])
            zkp.batch_add_improvement_proof(bid, 30, 50)
            zkp.batch_add_consistency_proof(bid, [10, 20, 30, 40, 50])
        t0 = time.monotonic()
        big = zkp.process_batch(bid)
        mixed1020_pps = max(mixed1020_pps, len(big) / (time.monotonic() - t0))

    # -- parallel verification over the mixed batch (RLC-batched MSMs) ------
    types = ["range", "equality", "threshold", "membership", "improvement",
             "consistency"] * 20
    pv_pps = 0.0
    for _ in range(2):
        t0 = time.monotonic()
        flags = zkp.verify_proofs_parallel(list(zip(mixed, types)))
        pv_pps = max(pv_pps, len(mixed) / (time.monotonic() - t0))
        assert all(flags), "mixed batch failed parallel verification"

    # -- TPU-batched MiMC commitments/s vs the host tier --------------------
    # This is the default-on device path for commitment-heavy batches
    # (process_batch pre-hashes >=64 distinct equality/membership values on
    # the chip); the host number is the same hash on the Python/host tier.
    mimc_per_s = None
    try:
        import jax

        if jax.default_backend() != "cpu":  # tunnel down -> skip, not crawl
            mimc_hash_batch(list(range(4096)))  # compile
            t0 = time.monotonic()
            mimc_hash_batch(list(range(1, 4097)))
            mimc_per_s = 4096 / (time.monotonic() - t0)
    except Exception:
        pass
    from libzkp_tpu.ops.mimc import mimc_hash_native

    t0 = time.monotonic()
    for v in range(100000, 100512):
        mimc_hash_native(v)
    mimc_host_per_s = 512 / (time.monotonic() - t0)

    # -- TPU-batched STARK trace LDE (guarded: compile excluded) ------------
    lde_per_s = None
    try:
        import jax

        if jax.default_backend() == "cpu":
            raise RuntimeError("no device")
        from libzkp_tpu.ops.ntt import coset_lde_batch
        from libzkp_tpu.ops.field import F128

        traces = [[(7 * i + j) % F128.p for j in range(8)] for i in range(256)]
        coset_lde_batch(F128.p, traces, 8, 3)  # compile
        t0 = time.monotonic()
        coset_lde_batch(F128.p, traces, 8, 3)
        lde_per_s = 256 / (time.monotonic() - t0)
    except Exception:
        pass

    baseline_pps = 1000.0 / 15.0  # reference ~15 ms/improvement proof
    # Metric name is honest about the route: the default improvement-prove
    # path is the native host pipeline (OMP), not the chip; chip-side numbers
    # are reported separately in extra (device_* and *_batched entries).
    result = {
        "metric": "improvement_proofs_per_sec",
        "value": round(pps, 3),
        "unit": "proofs/s",
        "vs_baseline": round(pps / baseline_pps, 4),
        "extra": {
            "improvement_verify_proofs_per_sec": round(ver_pps, 1),
            "mixed_batch_proofs_per_sec": round(mixed_pps, 1),
            "mixed_batch_1020_proofs_per_sec": round(mixed1020_pps, 1),
            "parallel_verify_proofs_per_sec": round(pv_pps, 1),
            "mimc_commitments_per_sec_batched": round(mimc_per_s, 1) if mimc_per_s else None,
            "mimc_commitments_per_sec_host": round(mimc_host_per_s, 1),
            "stark_trace_ldes_per_sec_batched": round(lde_per_s, 1) if lde_per_s else None,
            **lat,
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
