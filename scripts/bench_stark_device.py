#!/usr/bin/env python
"""VERDICT r4 #5: measured device-vs-host verdict for the STARK batch prover.

Compares the default native whole-pipeline batch (8.3k proofs/s class)
against the device path (fused LDE + canonicalization + BLAKE3 leaf commit
on chip, host FRI/query assembly) at B in {64, 256, 1024}.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("LIBZKP_DEVICE_LDE_MIN", "64")


def main():
    import jax

    print("backend:", jax.default_backend(), flush=True)
    from libzkp_tpu.models import stark_backend as sb

    for B in (64, 256, 1024):
        pairs = [(i + 1, i + 9) for i in range(B)]

        os.environ.pop("LIBZKP_NO_NATIVE_STARK", None)
        sb.prove_improvement_batch(pairs)  # warm
        t0 = time.monotonic()
        out_native = sb.prove_improvement_batch(pairs)
        t_native = time.monotonic() - t0

        os.environ["LIBZKP_NO_NATIVE_STARK"] = "1"
        sb.prove_improvement_batch(pairs)  # warm/compile
        best = 1e9
        for _ in range(3):
            t0 = time.monotonic()
            out_dev = sb.prove_improvement_batch(pairs)
            best = min(best, time.monotonic() - t0)
        os.environ.pop("LIBZKP_NO_NATIVE_STARK", None)

        assert all(
            sb.verify_improvement(p, o, n)
            for p, (o, n) in zip(out_dev, pairs[:8])
        )
        verdict = "DEVICE" if best < t_native else "host-native"
        print(
            f"B={B:5d}: native {B/t_native:8.0f} proofs/s  "
            f"device-path {B/best:8.0f} proofs/s -> {verdict}",
            flush=True,
        )


if __name__ == "__main__":
    main()
