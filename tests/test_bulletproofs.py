"""Bulletproofs backend + range/threshold/consistency schemes."""

import random

import pytest

from libzkp_tpu.models.bulletproofs_backend import BulletproofsBackend
from libzkp_tpu.models.schemes.consistency_proof import (
    prove_consistency,
    verify_consistency,
)
from libzkp_tpu.models.schemes.range_proof import (
    prove_range,
    prove_range_with_bits,
    verify_range,
)
from libzkp_tpu.models.schemes.threshold_proof import (
    prove_threshold,
    prove_threshold_with_bits,
    verify_threshold,
)
from libzkp_tpu.utils.envelope import Proof
from libzkp_tpu.utils.errors import InvalidInput


class TestBackend:
    def test_wire_roundtrip(self):
        # reference bulletproofs.rs:691-698
        from libzkp_tpu.models.bulletproofs_backend import (
            decode_proof_body_and_commit,
            encode_proof_body_with_commit,
        )

        body = b"hello proof body"
        commit = b"\x07" * 32
        w = encode_proof_body_with_commit(body, commit)
        db, cc = decode_proof_body_and_commit(w)
        assert db == body and cc == commit

    def test_prove_range_roundtrip(self):
        # reference bulletproofs.rs:700-706
        p = BulletproofsBackend.prove_range_with_bounds(5, 0, 10)
        assert BulletproofsBackend.verify_range_with_bounds(p, 0, 10)
        assert not BulletproofsBackend.verify_range_with_bounds(p, 0, 4)

    def test_raw_trait_interface(self):
        data = (42).to_bytes(8, "little")
        p = BulletproofsBackend.prove(data)
        assert p
        assert BulletproofsBackend.verify(p, data)
        assert not BulletproofsBackend.verify(p[:-1], data)


class TestRangeScheme:
    def test_roundtrip(self):
        p = prove_range(10, 0, 20)
        env = Proof.from_bytes(p)
        assert env.scheme == 1 and env.version == 2
        assert verify_range(p, 0, 20)
        assert not verify_range(p, 0, 19)
        assert not verify_range(p, 1, 20)

    def test_8bit(self):
        p = prove_range_with_bits(50, 0, 100, 8)
        assert verify_range(p, 0, 100)
        assert len(p) < 1400  # 8-bit proofs are smaller

    def test_bit_capacity(self):
        from libzkp_tpu.utils.errors import BackendError

        with pytest.raises(BackendError):
            prove_range_with_bits(0, 0, 300, 8)  # max-value diff exceeds 8 bits

    def test_out_of_range_rejected(self):
        with pytest.raises(InvalidInput):
            prove_range(15, 0, 10)

    def test_tamper(self):
        p = prove_range(10, 0, 20)
        rng = random.Random(11)
        for _ in range(6):
            b = bytearray(p)
            b[rng.randrange(10, len(b))] ^= rng.randrange(1, 256)
            assert not verify_range(bytes(b), 0, 20)

    def test_min_greater_than_max(self):
        p = prove_range(10, 0, 20)
        assert not verify_range(p, 20, 0)


class TestThresholdScheme:
    def test_roundtrip(self):
        p = prove_threshold([10, 20, 30, 40], 50)
        env = Proof.from_bytes(p)
        assert env.scheme == 3
        assert verify_threshold(p, 50)
        assert not verify_threshold(p, 51)

    def test_8bit(self):
        p = prove_threshold_with_bits([10, 20, 30], 50, 8)
        assert verify_threshold(p, 50)

    def test_not_met(self):
        with pytest.raises(InvalidInput):
            prove_threshold([1, 2], 100)

    def test_empty(self):
        with pytest.raises(InvalidInput):
            prove_threshold([], 1)

    def test_overflow(self):
        with pytest.raises(InvalidInput):
            prove_threshold([2**64 - 1, 5], 1)


class TestConsistencyScheme:
    def test_roundtrip(self):
        p = prove_consistency([10, 20, 30])
        env = Proof.from_bytes(p)
        assert env.scheme == 6
        assert verify_consistency(p)

    def test_duplicates_allowed(self):
        p = prove_consistency([5, 5, 7])
        assert verify_consistency(p)

    def test_single_element(self):
        p = prove_consistency([42])
        assert verify_consistency(p)

    def test_decreasing_rejected(self):
        with pytest.raises(InvalidInput):
            prove_consistency([3, 2, 1])

    def test_tamper(self):
        p = prove_consistency([1, 2])
        b = bytearray(p)
        b[len(b) // 2] ^= 0xFF
        assert not verify_consistency(bytes(b))


class TestNativeBatchProver:
    """The native whole-pipeline prover (zkpcore.cpp zkp_bp_prove_batch) must
    be bit-identical to the Python golden model under injected randomness —
    this exercises the C++ STROBE transcript, mod-l Montgomery arithmetic,
    signed-digit MSM, and ristretto compression in one shot."""

    def test_bit_exact_vs_python(self):
        import os

        from libzkp_tpu import native
        from libzkp_tpu.models import bulletproofs as bp
        from libzkp_tpu.models.strobe import Transcript

        if not native.HAVE_NATIVE:
            pytest.skip("native tier unavailable")

        for n in (8, 64):
            rand = os.urandom((2 * n + 4) * 64 * 3)

            def mk():
                return [
                    (Transcript(b"libzkp_range_min"), 7, 1234567, n),
                    (Transcript(b"libzkp_range_max"), (1 << n) - 1,
                     (bp.L - 987) % bp.L, n),
                    (Transcript(b"libzkp_threshold"), 0, 42, n),
                ]

            nat = bp._prove_batch_native(mk(), n, rand)
            assert nat is not None
            os.environ["LIBZKP_NO_NATIVE_BP"] = "1"
            try:
                py = bp._prove_batch_fixed_n(mk(), n, rand)
            finally:
                del os.environ["LIBZKP_NO_NATIVE_BP"]
            for j, ((rp_n, v_n), (rp_p, v_p)) in enumerate(zip(nat, py)):
                assert v_n == v_p, f"n={n} proof {j}: V differs"
                assert rp_n.to_bytes() == rp_p.to_bytes(), (
                    f"n={n} proof {j}: proof bytes differ"
                )

    def test_native_proofs_verify(self):
        from libzkp_tpu import native
        from libzkp_tpu.models import bulletproofs as bp
        from libzkp_tpu.models.bulletproofs import verify_single
        from libzkp_tpu.models.strobe import Transcript

        if not native.HAVE_NATIVE:
            pytest.skip("native tier unavailable")
        insts = [
            (Transcript(b"libzkp_range_min"), 3 + j, 99 + j, 64) for j in range(5)
        ]
        for j, (rp, V) in enumerate(bp.prove_single_batch(insts)):
            assert verify_single(rp, Transcript(b"libzkp_range_min"), V, 64)
