#!/usr/bin/env python
"""Measure the whole-pipeline on-device bulletproofs prover vs the host tier.

Usage: python scripts/bench_bp_device.py [B]

Times prove_insts_device at batch size B (end-to-end: upload, all phases on
device, one download) against the native host batch prover on the same
instances, and cross-verifies a sample of the device proofs.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

B = int(sys.argv[1]) if len(sys.argv) > 1 else 256


def main():
    import jax

    print("backend:", jax.default_backend(), f"B={B}", flush=True)
    import random

    from libzkp_tpu.models import bp_device, bulletproofs as bp
    from libzkp_tpu.models.strobe import Transcript

    rng = random.Random(99)
    values = [rng.randrange(1 << 63) for _ in range(B)]
    gammas = [rng.randrange(1, bp.L) for _ in range(B)]

    def insts():
        return [
            (Transcript(b"libzkp_range_min"), v, g, 64)
            for v, g in zip(values, gammas)
        ]

    # host native batch prover
    t0 = time.monotonic()
    host_out = bp.prove_single_batch(insts())
    t_host = time.monotonic() - t0
    print(f"host native batch : {t_host*1e3:9.1f} ms ({t_host/B*1e3:.3f} ms/proof)", flush=True)

    # device prover (first call pays compiles)
    t0 = time.monotonic()
    out = bp_device.prove_insts_device(insts())
    t_first = time.monotonic() - t0
    print(f"device first call : {t_first:9.1f} s (compiles)", flush=True)
    best = 1e9
    for _ in range(3):
        t0 = time.monotonic()
        out = bp_device.prove_insts_device(insts())
        best = min(best, time.monotonic() - t0)
    print(f"device warm       : {best*1e3:9.1f} ms ({best/B*1e3:.3f} ms/proof) "
          f"[{t_host/best:.2f}x vs host]", flush=True)

    # verify a sample
    ok = 0
    idxs = list(range(0, B, max(1, B // 8)))
    for i in idxs:
        pb, V = out[i]
        proof = bp.RangeProof.from_bytes(pb)
        t = Transcript(b"libzkp_range_min")
        ok += bool(proof and bp.verify_single(proof, t, V, 64))
    print(f"verified sample: {ok}/{len(idxs)}", flush=True)

    # record the verdict for the dispatch gate (models/bulletproofs.py)
    import json

    assert ok == len(idxs), "device proofs failed verification; not recording"
    rec = {
        "verdict": "device" if best < t_host else "host",
        "device_ms_per_proof": round(best / B * 1e3, 4),
        "host_ms_per_proof": round(t_host / B * 1e3, 4),
        "batch": B,
        "min_batch": 128,
    }
    path = os.environ.get(
        "LIBZKP_BP_TUNE_FILE",
        os.path.expanduser("~/.cache/libzkp_tpu/bp_autotune.json"),
    )
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as fh:
        json.dump(rec, fh, indent=1)
    print("recorded:", rec, flush=True)


if __name__ == "__main__":
    main()
