"""Utils layer: envelope, limits, serialization, validation, errors."""

import pytest

from libzkp_tpu.utils import envelope, serialization, validation
from libzkp_tpu.utils.envelope import PROOF_VERSION, Proof
from libzkp_tpu.utils.errors import (
    InvalidInput,
    InvalidProofFormat,
    SerializationError,
    ZkpError,
)


class TestEnvelope:
    def test_roundtrip(self):
        p = Proof.new(1, b"payload-bytes", b"\x07" * 32)
        data = p.to_bytes()
        q = Proof.from_bytes(data)
        assert q.version == PROOF_VERSION
        assert q.scheme == 1
        assert q.proof == b"payload-bytes"
        assert q.commitment == b"\x07" * 32

    def test_wire_layout(self):
        # [version][scheme][proof_len u32][comm_len u32][proof][commitment]
        p = Proof.new(3, b"ab", b"cd" * 16)
        data = p.to_bytes()
        assert data[0] == 2 and data[1] == 3
        assert int.from_bytes(data[2:6], "little") == 2
        assert int.from_bytes(data[6:10], "little") == 32
        assert data[10:12] == b"ab"

    def test_too_short(self):
        with pytest.raises(InvalidProofFormat):
            Proof.from_bytes(b"\x02\x01")

    def test_length_mismatch(self):
        p = Proof.new(1, b"x" * 10, b"y" * 32).to_bytes()
        with pytest.raises(InvalidProofFormat):
            Proof.from_bytes(p + b"\x00")  # trailing byte
        with pytest.raises(InvalidProofFormat):
            Proof.from_bytes(p[:-1])  # truncated

    def test_oversize_commitment_rejected(self):
        data = (
            bytes([2, 1])
            + (0).to_bytes(4, "little")
            + (300).to_bytes(4, "little")
            + b"z" * 300
        )
        with pytest.raises(InvalidProofFormat):
            Proof.from_bytes(data)

    def test_errors_map_to_python_builtins(self):
        # PyO3 mapping parity: InvalidInput -> ValueError, format -> TypeError
        assert issubclass(InvalidInput, ValueError)
        assert issubclass(InvalidProofFormat, TypeError)
        assert issubclass(InvalidInput, ZkpError)


class TestSerialization:
    def test_u64_vec_roundtrip(self):
        v = [1, 2, 3, 2**64 - 1]
        b = serialization.serialize_u64_vec(v)
        assert serialization.deserialize_u64_vec(b) == v

    def test_u64_vec_oversize(self):
        b = serialization.serialize_u64_vec([0] * 5000)
        with pytest.raises(SerializationError):
            serialization.deserialize_u64_vec(b)

    def test_backend_payload_roundtrip(self):
        p = serialization.create_backend_payload("range_proof", b"\x01\x02\x03")
        op, params = serialization.parse_backend_payload(p)
        assert op == "range_proof"
        assert params == b"\x01\x02\x03"

    def test_backend_payload_rejects_long_operation(self):
        assert serialization.create_backend_payload("a" * 65, b"") == b""


class TestValidation:
    def test_range(self):
        validation.validate_range_params(5, 0, 10)
        with pytest.raises(InvalidInput):
            validation.validate_range_params(11, 0, 10)
        with pytest.raises(InvalidInput):
            validation.validate_range_params(5, 10, 0)

    def test_threshold(self):
        assert validation.validate_threshold_params([10, 20], 25) == 30
        with pytest.raises(InvalidInput):
            validation.validate_threshold_params([], 1)
        with pytest.raises(InvalidInput):
            validation.validate_threshold_params([1, 2], 100)
        with pytest.raises(InvalidInput):
            validation.validate_threshold_params([2**64 - 1, 5], 1)

    def test_consistency(self):
        validation.validate_consistency_params([1, 1, 2, 3])
        with pytest.raises(InvalidInput):
            validation.validate_consistency_params([3, 2])

    def test_improvement(self):
        assert validation.validate_improvement_params(1, 8) == 7
        with pytest.raises(InvalidInput):
            validation.validate_improvement_params(8, 8)


class TestCitations:
    def test_no_phantom_reference_citations(self):
        """Every ``*.rs:line`` citation must fit inside the cited reference
        file (guards against pasted line numbers from other sources)."""
        import importlib.util
        import os

        path = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "scripts",
            "check_citations.py",
        )
        if not os.path.isdir("/root/reference"):
            pytest.skip("reference tree not mounted")
        spec = importlib.util.spec_from_file_location("check_citations", path)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        assert mod.check() == []
