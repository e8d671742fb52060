"""Groth16 SNARK backend + equality/membership schemes + key persistence."""

import random

import pytest

from libzkp_tpu.models import groth16
from libzkp_tpu.models.schemes.equality_proof import (
    prove_equality,
    verify_equality,
    verify_equality_with_commitment,
)
from libzkp_tpu.models.schemes.set_membership import (
    prove_membership,
    verify_membership,
)
from libzkp_tpu.models.snark_backend import SnarkBackend
from libzkp_tpu.ops.mimc import fr_to_commitment, mimc_hash_native
from libzkp_tpu.utils.commitment import commit_value_snark
from libzkp_tpu.utils.envelope import Proof
from libzkp_tpu.utils.errors import InvalidInput


def test_groth16_equality_roundtrip():
    # reference snark.rs:631-641
    commitment = commit_value_snark(42)
    proof = SnarkBackend.prove_equality_zk(42, 42, commitment)
    assert proof
    assert SnarkBackend.verify_equality_zk(proof, commitment)
    wrong = commit_value_snark(99)
    assert not SnarkBackend.verify_equality_zk(proof, wrong)


def test_equality_scheme():
    p = prove_equality(5, 5)
    env = Proof.from_bytes(p)
    assert env.scheme == 2 and len(env.commitment) == 32
    assert env.commitment == fr_to_commitment(mimc_hash_native(5))
    assert verify_equality(p, 5, 5)
    assert not verify_equality(p, 5, 6)
    assert not verify_equality(p, 6, 6)
    assert verify_equality_with_commitment(p, commit_value_snark(5))
    assert not verify_equality_with_commitment(p, commit_value_snark(7))


def test_equality_unequal_rejected():
    with pytest.raises(InvalidInput):
        prove_equality(1, 2)


def test_equality_tamper():
    p = prove_equality(9, 9)
    rng = random.Random(5)
    for _ in range(4):
        b = bytearray(p)
        b[rng.randrange(10, len(b))] ^= rng.randrange(1, 256)
        assert not verify_equality(bytes(b), 9, 9)


def test_membership_scheme():
    p = prove_membership(25, [10, 20, 25, 30, 40])
    env = Proof.from_bytes(p)
    assert env.scheme == 4
    assert verify_membership(p, [10, 20, 25, 30, 40])
    # order-insensitive set comparison (set_membership.rs:59-67)
    assert verify_membership(p, [40, 30, 25, 20, 10])
    assert not verify_membership(p, [10, 20, 25, 30, 41])
    assert not verify_membership(p, [10, 20, 25, 30])


def test_membership_not_in_set():
    with pytest.raises(InvalidInput):
        prove_membership(26, [10, 20])


def test_membership_set_too_large():
    with pytest.raises(InvalidInput):
        prove_membership(1, list(range(1, 66)))


def test_proof_serialization_roundtrip():
    c = commit_value_snark(3)
    raw = SnarkBackend.prove_equality_zk(3, 3, c)
    pf = groth16.proof_from_bytes(raw)
    assert pf is not None
    assert groth16.proof_to_bytes(pf) == raw
    assert len(raw) == 256


def test_key_persistence(tmp_path, monkeypatch):
    # fresh "process": clear setup caches, point key dir at tmp
    from libzkp_tpu.models import snark_backend as sb

    sb._reset_for_tests()
    sb.set_snark_key_dir(str(tmp_path))
    c = commit_value_snark(11)
    p1 = sb.SnarkBackend.prove_equality_zk(11, 11, c)
    assert (tmp_path / "equality_mimc_pk.bin").exists()
    assert (tmp_path / "equality_mimc_vk.bin").exists()
    # simulate a new process: reset caches, keep dir -> keys load from disk
    eq_setup_before = sb._equality_setup
    sb._reset_for_tests()
    sb.set_snark_key_dir(str(tmp_path))
    assert sb.SnarkBackend.verify_equality_zk(p1, c)
    # config rejected after setup initialized
    from libzkp_tpu.utils.errors import ConfigError

    assert sb.is_snark_initialized()
    with pytest.raises(ConfigError):
        sb.set_snark_key_dir("/other/dir")
    sb._reset_for_tests()  # leave clean state for other tests


def test_fast_assignment_matches_constraint_system():
    """Witness-only assignment builders must equal full_assignment() of the
    gadget-built circuits, element for element."""
    from libzkp_tpu.models import snark_backend as sb

    com = 123456789
    cs = sb.build_equality_circuit(7, 7, com)
    assert sb._equality_assignment(7, 7, com) == cs.full_assignment()

    value, the_set = 25, [10, 20, 25, 30, 40]
    set_values = list(the_set) + [0] * (sb.MAX_SET_SIZE - len(the_set))
    is_real = [True] * len(the_set) + [False] * (sb.MAX_SET_SIZE - len(the_set))
    sel = [False] * sb.MAX_SET_SIZE
    sel[2] = True
    cs = sb.build_membership_circuit(value, sel, set_values, is_real, com)
    assert (
        sb._membership_assignment(value, sel, set_values, is_real, com)
        == cs.full_assignment()
    )


def test_fast_path_proofs_verify():
    """Second and later proves (fast assignment path) must verify."""
    from libzkp_tpu.models.schemes.equality_proof import prove_equality, verify_equality
    from libzkp_tpu.models.schemes.set_membership import (
        prove_membership,
        verify_membership,
    )

    for v in (5, 9, 123):
        assert verify_equality(prove_equality(v, v), v, v)
    for v, s in ((25, [10, 25, 40]), (7, [7]), (3, list(range(1, 65)))):
        assert verify_membership(prove_membership(v, s), s)


class TestDeviceHPipeline:
    """The device QAP h-pipeline (ops/groth16_device.py: 7 NTTs per proof as
    one batched jit) must be bit-exact vs the native C++ pipeline."""

    def test_differential_vs_native(self):
        import libzkp_tpu.api as zkp

        zkp.prove_equality(42, 42)  # seeds the CSR cache + setup
        from libzkp_tpu import native
        from libzkp_tpu.models import groth16 as g
        from libzkp_tpu.models.snark_backend import (
            _circuit_meta, _equality_assignment, _get_equality_setup)
        from libzkp_tpu.ops import mimc
        from libzkp_tpu.ops.field import BN254_FR
        from libzkp_tpu.ops.groth16_device import h_batch_device

        pk = _get_equality_setup()
        ni, nc = _circuit_meta["equality"]
        n = len(pk.h_query) + 1
        zs = [
            _equality_assignment(v, v, mimc.mimc_hash_native(v))
            for v in (42, 7, 123456)
        ]
        csr = g._csr_cache.get(("equality", n, nc, len(zs[0])))
        root = BN254_FR.root_of_unity(n)
        want = [native.groth16_h(n, nc, ni, g.R, root, 5, csr, z) for z in zs]
        abc = [native.groth16_spmv(n, nc, ni, g.R, csr, z) for z in zs]
        got = h_batch_device(
            n, [t[0] for t in abc], [t[1] for t in abc], [t[2] for t in abc]
        )
        assert got == want
