"""STARK backend + improvement proof scheme (reference stark.rs test parity+)."""

import random

import pytest

from libzkp_tpu.models.schemes.improvement_proof import (
    prove_improvement,
    verify_improvement,
)
from libzkp_tpu.models.stark_backend import StarkBackend
from libzkp_tpu.models import stark_backend
from libzkp_tpu.utils.envelope import Proof
from libzkp_tpu.utils.errors import InvalidInput


def test_stark_backend_roundtrip():
    # reference stark.rs:254-267
    data = (1).to_bytes(8, "little") + (8).to_bytes(8, "little")
    proof = StarkBackend.prove(data)
    assert proof
    assert StarkBackend.verify(proof, data)


def test_stark_backend_bad_input_lengths():
    assert StarkBackend.prove(b"short") == b""
    assert not StarkBackend.verify(b"x", b"short")


def test_backend_rejects_non_improvement():
    data = (8).to_bytes(8, "little") + (1).to_bytes(8, "little")
    assert StarkBackend.prove(data) == b""


def test_improvement_scheme_roundtrip():
    p = prove_improvement(30, 50)
    assert verify_improvement(p, 30)
    assert not verify_improvement(p, 31)


def test_improvement_envelope_fields():
    p = prove_improvement(1, 8)
    env = Proof.from_bytes(p)
    assert env.scheme == 5 and env.version == 2
    assert int.from_bytes(env.proof[0:8], "little") == 1
    assert int.from_bytes(env.proof[8:16], "little") == 8
    assert len(env.commitment) == 32


def test_improvement_rejects_equal():
    with pytest.raises(InvalidInput):
        prove_improvement(8, 8)
    with pytest.raises(InvalidInput):
        prove_improvement(9, 8)


def test_improvement_tamper_rejection():
    p = prove_improvement(1, 8)
    rng = random.Random(42)
    for _ in range(10):
        b = bytearray(p)
        b[rng.randrange(len(b))] ^= rng.randrange(1, 256)
        assert not verify_improvement(bytes(b), 1)
    assert not verify_improvement(p[:-1], 1)
    assert not verify_improvement(p + b"\x00", 1)


def test_improvement_wrong_options_rejected(monkeypatch):
    # AcceptableOptions behavior: a proof generated under different options
    # must be rejected by the standard verifier.
    from libzkp_tpu.models import stark

    alt = stark.ProofOptions(num_queries=16, blowup=8, grinding=0, folding=8,
                             max_remainder_degree=31)
    monkeypatch.setattr(stark_backend, "DEFAULT_OPTIONS", alt)
    p_alt = prove_improvement(1, 8)
    monkeypatch.undo()
    assert not verify_improvement(p_alt, 1)


def test_large_values():
    p = prove_improvement(0, 2**64 - 1)
    assert verify_improvement(p, 0)


def test_prove_improvement_batch_device_path(monkeypatch):
    """Batched prover (device LDE path forced) must agree with the per-proof
    path and produce verifying proofs."""
    from libzkp_tpu.models import stark_backend
    from libzkp_tpu.models.schemes.improvement_proof import (
        prove_improvement_batch,
        verify_improvement,
    )

    monkeypatch.setattr(stark_backend, "_MIN_DEVICE_LDE_BATCH", 32)
    pairs = [(i, i + 3 + (i % 5)) for i in range(64)]
    proofs = prove_improvement_batch(pairs)
    assert len(proofs) == 64
    assert all(verify_improvement(p, old) for p, (old, _) in zip(proofs, pairs))
    # wrong old rejected
    assert not verify_improvement(proofs[0], pairs[0][0] + 1)


def test_coset_lde_batch_matches_host():
    import random

    from libzkp_tpu.ops import ntt as poly
    from libzkp_tpu.ops.field import F128

    rng = random.Random(3)
    traces = [[rng.randrange(F128.p) for _ in range(8)] for _ in range(5)]
    polys, ldes = poly.coset_lde_batch(F128.p, traces, 8, 3)
    for t, c, l in zip(traces, polys, ldes):
        assert c == poly.interpolate(F128, t)
        assert l == poly.evaluate_coset(F128, c, 64, 3)


class TestWinterfellContainer:
    """Layout pins for the winterfell 0.10 proof container
    (libzkp_tpu/models/winterfell_wire.py field map)."""

    def test_vint64_roundtrip(self):
        from libzkp_tpu.models import winterfell_wire as ww

        for v in [0, 1, 127, 128, 16383, 16384, 2**21 - 1, 2**21, 2**55,
                  2**56, 2**63, 2**64 - 1]:
            buf = bytearray()
            ww.write_usize(buf, v)
            got, pos = ww.read_usize(bytes(buf), 0)
            assert got == v and pos == len(buf), v
        # one-byte encodings are odd; value = byte >> 1
        buf = bytearray()
        ww.write_usize(buf, 5)
        assert buf == bytes([(5 << 1) | 1])

    def test_container_structure(self):
        from libzkp_tpu.models import winterfell_wire as ww
        from libzkp_tpu.models.stark_backend import (
            DEFAULT_OPTIONS, prove_improvement)

        proof = prove_improvement(5, 9)
        w, n, modulus, opts, pos = ww.read_context(proof, 0)
        assert (w, n) == (1, 8)
        from libzkp_tpu.ops.field import F128

        assert modulus == F128.p
        assert opts == (32, 8, 0, 8, 31)  # ProofOptions(32, 8, 0, None, 8, 31)
        nuq = proof[pos]
        assert nuq == 32
        # pow nonce is the trailing u64
        assert len(proof) > pos + 8

    def test_exhaustive_tamper(self):
        from libzkp_tpu.models.stark_backend import (
            prove_improvement, verify_improvement)

        sp = prove_improvement(5, 9)
        assert verify_improvement(sp, 5, 9)
        for pos in range(0, len(sp), 7):  # every 7th byte: fast full sweep
            b = bytearray(sp)
            b[pos] ^= 0xFF
            assert not verify_improvement(bytes(b), 5, 9), f"byte {pos}"

    def test_batch_merkle_proof_sound(self):
        import os
        import random

        from libzkp_tpu.models import winterfell_wire as ww
        from libzkp_tpu.models.merkle import MerkleTree

        random.seed(3)
        leaves = [os.urandom(32) for _ in range(64)]
        tree = MerkleTree(leaves)
        positions = sorted(random.sample(range(64), 9))
        blob = ww.batch_proof_nodes(tree, positions)
        lv = [leaves[q] for q in positions]
        assert ww.batch_proof_verify(tree.root, tree.depth, positions, lv, blob)
        for pos in range(len(blob)):
            b = bytearray(blob)
            b[pos] ^= 0xFF
            assert not ww.batch_proof_verify(
                tree.root, tree.depth, positions, lv, bytes(b)
            ), f"blob byte {pos} unchecked"


class TestNativeStarkProver:
    """The native whole-pipeline improvement prover must be byte-exact vs
    the Python pipeline (the protocol is deterministic: same trace, same
    coin, same container)."""

    def test_byte_exact(self):
        from libzkp_tpu import native
        from libzkp_tpu.models import stark
        from libzkp_tpu.models import stark_backend as sb

        if not native.HAVE_NATIVE:
            pytest.skip("native tier unavailable")
        pairs = [(30, 50), (1, 8), (0, 2**63 - 1), (5, 5 + 7 * 3)]
        got = sb._prove_native(pairs)
        for (old, new), g in zip(pairs, got):
            air = sb.ImprovementAir(sb.TRACE_LENGTH, [old, new], sb.DEFAULT_OPTIONS)
            want = stark.prove(air, [sb._build_trace(air, old)])
            assert g == want
            assert sb.verify_improvement(g, old, new)

    def test_cross_tier_verify(self):
        import os

        from libzkp_tpu import native
        from libzkp_tpu.models import stark_backend as sb

        if not native.HAVE_NATIVE:
            pytest.skip("native tier unavailable")
        p_native = sb.prove_improvement(3, 9)
        os.environ["LIBZKP_NO_NATIVE_STARK"] = "1"
        try:
            p_python = sb.prove_improvement(3, 9)
            assert sb.verify_improvement(p_native, 3, 9)
        finally:
            del os.environ["LIBZKP_NO_NATIVE_STARK"]
        assert sb.verify_improvement(p_python, 3, 9)
        assert p_native == p_python  # deterministic protocol


class TestNativeStarkVerifier:
    """Native verifier must agree with the Python verifier on valid,
    tampered, truncated, and wrong-public-input cases."""

    def test_agreement_sweep(self):
        from libzkp_tpu import native
        from libzkp_tpu.models import stark
        from libzkp_tpu.models import stark_backend as sb

        if not native.HAVE_NATIVE:
            pytest.skip("native tier unavailable")
        p = sb.prove_improvement(30, 50)
        air = sb.ImprovementAir(sb.TRACE_LENGTH, [30, 50], sb.DEFAULT_OPTIONS)
        assert sb.verify_improvement(p, 30, 50)
        assert not sb.verify_improvement(p, 30, 51)
        for pos in range(0, len(p), 11):
            b = bytes(bytearray(p[:pos]) + bytes([p[pos] ^ 0xFF]) + p[pos + 1:])
            assert sb.verify_improvement(b, 30, 50) == stark.verify(air, b)
        for cut in range(0, len(p), 97):
            assert not sb.verify_improvement(p[:cut], 30, 50)
