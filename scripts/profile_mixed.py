#!/usr/bin/env python
"""Per-phase profile of the canonical mixed batch (bench.py's 120-op mix).

Prints a JSON dict of phase -> ms so the gap attribution in BASELINE.md is
numbers, not prose.
"""

from __future__ import annotations

import json
import time

import libzkp_tpu.api as zkp
from libzkp_tpu.utils.composition import BatchOperation


def canonical_ops(n_each: int = 20):
    ops = []
    for _ in range(n_each):
        ops.append(BatchOperation("range", (50, 0, 100)))
        ops.append(BatchOperation("equality", (42, 42)))
        ops.append(BatchOperation("threshold", ([10, 20, 30, 40], 50)))
        ops.append(BatchOperation("membership", (25, [10, 20, 25, 30, 40])))
        ops.append(BatchOperation("improvement", (30, 50)))
        ops.append(BatchOperation("consistency", ([10, 20, 30, 40, 50],)))
    return ops


def time_phase(label, fn, out, reps=3):
    best = float("inf")
    for _ in range(reps):
        t0 = time.monotonic()
        fn()
        best = min(best, time.monotonic() - t0)
    out[label] = round(best * 1e3, 2)


def main() -> None:
    # warm everything
    zkp.prove_range(50, 0, 100)
    zkp.prove_equality(42, 42)
    zkp.prove_threshold([10, 20, 30, 40], 50)
    zkp.prove_membership(25, [10, 20, 25, 30, 40])
    zkp.prove_improvement(30, 50)
    zkp.prove_consistency([10, 20, 30, 40, 50])

    n_each = 20
    out = {}

    from libzkp_tpu.models.schemes.range_proof import prove_range_batch
    from libzkp_tpu.models.schemes.threshold_proof import prove_threshold_batch
    from libzkp_tpu.models.schemes.consistency_proof import prove_consistency_batch
    from libzkp_tpu.models.schemes.equality_proof import prove_equality_batch
    from libzkp_tpu.models.schemes.set_membership import prove_membership_batch
    from libzkp_tpu.models.schemes.improvement_proof import prove_improvement_batch

    time_phase(
        "range_bucket_20", lambda: prove_range_batch([(50, 0, 100)] * n_each), out
    )
    time_phase(
        "threshold_bucket_20",
        lambda: prove_threshold_batch([([10, 20, 30, 40], 50)] * n_each),
        out,
    )
    time_phase(
        "consistency_bucket_20",
        lambda: prove_consistency_batch([[10, 20, 30, 40, 50]] * n_each),
        out,
    )
    time_phase(
        "equality_bucket_20",
        lambda: prove_equality_batch([(42, 42)] * n_each),
        out,
    )
    time_phase(
        "membership_bucket_20",
        lambda: prove_membership_batch([(25, [10, 20, 25, 30, 40])] * n_each),
        out,
    )
    time_phase(
        "improvement_bucket_20",
        lambda: prove_improvement_batch([(30, 50)] * n_each),
        out,
    )

    # whole mixed batch through the public path
    def whole():
        bid = zkp.create_proof_batch()
        for _ in range(n_each):
            zkp.batch_add_range_proof(bid, 50, 0, 100)
            zkp.batch_add_equality_proof(bid, 42, 42)
            zkp.batch_add_threshold_proof(bid, [10, 20, 30, 40], 50)
            zkp.batch_add_membership_proof(bid, 25, [10, 20, 25, 30, 40])
            zkp.batch_add_improvement_proof(bid, 30, 50)
            zkp.batch_add_consistency_proof(bid, [10, 20, 30, 40, 50])
        t0 = time.monotonic()
        zkp.process_batch(bid)
        return time.monotonic() - t0

    best = min(whole() for _ in range(3))
    out["mixed_120_total"] = round(best * 1e3, 2)
    out["mixed_120_pps"] = round(120 / best, 1)
    sum_buckets = sum(
        v for k, v in out.items() if k.endswith("_bucket_20")
    )
    out["sum_of_buckets_ms"] = round(sum_buckets, 2)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
