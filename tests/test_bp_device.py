"""Differential test: on-device bulletproofs prover vs the host prover.

Same injected randomness -> byte-identical 672-byte proofs and value
commitments, and the device proofs verify under the host verifier. One
prove call covers both checks (the CPU interpret tier takes ~10 minutes
per batched prove; the chip-side win is measured by
scripts/bench_bp_device.py).
"""

from __future__ import annotations

import random

import pytest

from libzkp_tpu.models import bp_device, bulletproofs as bp
from libzkp_tpu.models.strobe import Transcript

L = bp.L


def test_device_prover_matches_host_and_verifies(monkeypatch):
    rng = random.Random(0xBDD)
    rnd_lanes = [
        [rng.randrange(1, L) for _ in range(2 * 64 + 4)] for _ in range(2)
    ]
    # lane 1's high-bit value is the regression case for the 64-term-sum
    # carry bound (single-carry limbs overflowed the next conv in int32)
    values = [7, (1 << 63) + 12345]
    gammas = [123456789, 987654321]

    # host reference with the same randomness, in prove_single's draw order
    # (= the device rnd layout): a, s, s_L(64), s_R(64), t1, t2
    host_out = []
    for lane, (v, g) in enumerate(zip(values, gammas)):
        it = iter(rnd_lanes[lane])
        monkeypatch.setattr(bp, "_random_scalar", lambda it=it: next(it))
        monkeypatch.setattr(bp, "_use_native_prover", lambda: False)
        t = Transcript(b"libzkp_range_min")
        proof, V = bp.prove_single(t, v, g, 64)
        host_out.append((proof.to_bytes(), V))

    dev_out = bp_device.prove_single_batch_device(
        b"libzkp_range_min", values, gammas, rnd=rnd_lanes
    )
    for lane in range(2):
        assert dev_out[lane][1] == host_out[lane][1], f"V lane {lane}"
        assert dev_out[lane][0] == host_out[lane][0], f"proof lane {lane}"

    # and the device proofs stand alone under the host verifier
    for proof_bytes, V in dev_out:
        proof = bp.RangeProof.from_bytes(proof_bytes)
        assert proof is not None
        t = Transcript(b"libzkp_range_min")
        assert bp.verify_single(proof, t, V, 64)
