#!/usr/bin/env python
"""VERDICT r4 #7: measure the device Groth16 h-pipeline at BUCKET scale.

h_batch_device runs 7 batched NTTs over B x 3 vectors in ONE dispatch; the
round-3 measurement (6x slower at n=512) was per-proof. This measures both
tiers at the mixed-batch bucket sizes (B = 20..170 distinct statements) and
prints the verdict per B. Fetch-synced timing discipline.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from libzkp_tpu import native
from libzkp_tpu.models import snark_backend as sb
from libzkp_tpu.models import groth16
from libzkp_tpu.ops.field import BN254_FR

R = BN254_FR.p


def main():
    import jax

    print("backend:", jax.default_backend(), flush=True)
    # real equality-circuit az/bz/cz vectors: use the pk's domain size
    pk = sb._get_equality_setup()
    n = 512  # equality h-domain (334 constraints -> 512)
    rng = np.random.default_rng(11)

    def vecs(B):
        out = []
        for _ in range(3):
            out.append([
                [int.from_bytes(rng.bytes(32), "little") % R for _ in range(n)]
                for _ in range(B)
            ])
        return out

    from libzkp_tpu.ops.groth16_device import h_batch_device

    for B in (16, 64, 170):
        az, bz, cz = vecs(B)
        # force satisfiable shape: h degree check needs consistent az*bz-cz
        # on the coset; instead build cz so az*bz == cz on the eval domain
        # (h == 0 is fine for timing; correctness is covered by tests)
        cz = [[az[b][i] * bz[b][i] % R for i in range(n)] for b in range(B)]

        t0 = time.monotonic()
        host = [
            native.groth16_h(R, az[b], bz[b], cz[b], 5) for b in range(B)
        ]
        t_host = time.monotonic() - t0

        h_batch_device(n, az, bz, cz)  # warm/compile
        best = 1e9
        for _ in range(3):
            t0 = time.monotonic()
            h_batch_device(n, az, bz, cz)
            best = min(best, time.monotonic() - t0)
        verdict = "DEVICE" if best < t_host else "host"
        print(
            f"B={B:4d}: host {t_host*1e3:8.1f} ms  device {best*1e3:8.1f} ms "
            f"-> {verdict} ({t_host/best:.2f}x)",
            flush=True,
        )


if __name__ == "__main__":
    main()
