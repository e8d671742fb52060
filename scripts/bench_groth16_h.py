#!/usr/bin/env python
"""VERDICT r4 #7: measure the device Groth16 h-pipeline at BUCKET scale.

Drives the real deployed path — ``prove_equality_zk_many`` over B DISTINCT
statements — with the device h-pipeline off (native groth16_h per proof)
and on (native spmv + ``h_batch_device``: 7 batched NTTs over B x 3 vectors
in one dispatch). Round 3 measured the per-proof device path 6x slower;
this answers whether bucket-scale batching flips it.

Usage: python scripts/bench_groth16_h.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("LIBZKP_DEVICE_H_MIN", "16")
# repeated timing iterations must not hit the witness-accumulator memo
os.environ["LIBZKP_NO_WITNESS_MEMO"] = "1"


def run_bucket(B, device: bool):
    os.environ["LIBZKP_DEVICE_H"] = "1" if device else "0"
    from libzkp_tpu.models import snark_backend as sb
    from libzkp_tpu.utils.commitment import commit_value_snark

    # populate _circuit_meta (set by the first full prove in a process)
    sb.SnarkBackend.prove_equality_zk(1, 1, commit_value_snark(1))
    entries = [(i + 1, i + 1, commit_value_snark(i + 1)) for i in range(B)]
    # warm (setup, caches, compiles)
    out = sb.SnarkBackend.prove_equality_zk_many(entries)
    assert out is not None and all(out)
    best = 1e9
    for _ in range(3):
        t0 = time.monotonic()
        sb.SnarkBackend.prove_equality_zk_many(entries)
        best = min(best, time.monotonic() - t0)
    return best


def main():
    import jax

    print("backend:", jax.default_backend(), flush=True)
    for B in (16, 64, 170):
        t_host = run_bucket(B, device=False)
        t_dev = run_bucket(B, device=True)
        verdict = "DEVICE" if t_dev < t_host else "host"
        print(
            f"B={B:4d}: host {t_host*1e3:8.1f} ms  device-h {t_dev*1e3:8.1f} ms"
            f" -> {verdict} ({t_host/t_dev:.2f}x)",
            flush=True,
        )


if __name__ == "__main__":
    main()
