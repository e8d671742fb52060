"""FRI folding coverage: the production AIR (trace 8, blowup 8) never
commits a FRI layer (max remainder (31+1)*8 = 256 >= 64 = N), so this test
drives :func:`libzkp_tpu.models.stark.prove` with a trace long enough that
``_fri_layer_plan`` commits >= 2 layers, then checks the fold/query
consistency path end-to-end: verify, tamper rejection, and plan shape."""

import pytest

from libzkp_tpu.models import stark
from libzkp_tpu.models.stark import Air, ProofOptions


class CounterAir(Air):
    """next = cur + 1 over one column; start/end boundary assertions."""

    def __init__(self, trace_length: int, start: int, options: ProofOptions):
        super().__init__(trace_length, 1, [start], options)
        self.start = start

    def transition_degrees(self):
        return [1]

    def evaluate_transition(self, current, nxt):
        p = self.field.p
        return [(nxt[0] - current[0] - 1) % p]

    def get_assertions(self):
        return [
            (0, 0, self.start),
            (0, self.trace_length - 1, self.start + self.trace_length - 1),
        ]


OPTS = ProofOptions()  # production parameters: 32 queries, blowup 8, fold 8


def _proof_and_air(n=2048, start=7):
    air = CounterAir(n, start, OPTS)
    trace = [[(start + i) % air.field.p for i in range(n)]]
    return air, stark.prove(air, trace)


def test_layer_plan_commits_layers():
    # production improvement AIR: zero committed layers (documented shape)
    assert stark._fri_layer_plan(OPTS, 8 * OPTS.blowup) == []
    # long trace: 2048*8 = 16384 -> [16384, 2048], remainder domain 256
    assert stark._fri_layer_plan(OPTS, 2048 * OPTS.blowup) == [16384, 2048]


class TestDeepFri:
    air, proof = None, None

    @classmethod
    def setup_class(cls):
        cls.air, cls.proof = _proof_and_air()

    def test_roundtrip_with_folding(self):
        assert stark.verify(self.air, self.proof)

    def test_tamper_rejected_everywhere(self):
        # flip one byte at several offsets spanning commitments, FRI layer
        # openings, and the remainder polynomial
        n = len(self.proof)
        for off in [8, n // 4, n // 2, (3 * n) // 4, n - 5]:
            bad = bytearray(self.proof)
            bad[off] ^= 0x01
            assert not stark.verify(self.air, bytes(bad)), f"offset {off}"

    def test_truncation_rejected(self):
        assert not stark.verify(self.air, self.proof[:-1])
        assert not stark.verify(self.air, self.proof[: len(self.proof) // 2])
        assert not stark.verify(self.air, b"")

    def test_wrong_public_inputs_rejected(self):
        bad_air = CounterAir(2048, 8, OPTS)  # start=8, proof says 7
        assert not stark.verify(bad_air, self.proof)

    def test_unsatisfied_trace_rejected_at_prove(self):
        air = CounterAir(2048, 7, OPTS)
        trace = [[(7 + i) % air.field.p for i in range(2048)]]
        trace[0][100] = (trace[0][100] + 1) % air.field.p  # break transition
        with pytest.raises(Exception):
            stark.prove(air, trace)


def test_mid_size_single_committed_layer():
    """256*8 = 2048 -> exactly one committed layer + remainder."""
    assert stark._fri_layer_plan(OPTS, 256 * OPTS.blowup) == [2048]
    air, proof = _proof_and_air(n=256, start=3)
    assert stark.verify(air, proof)
    bad = bytearray(proof)
    bad[len(proof) - 9] ^= 0xFF
    assert not stark.verify(air, bytes(bad))
