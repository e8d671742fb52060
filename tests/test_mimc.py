"""MiMC-5 over BN254 Fr: determinism, batch==native, commitment codec."""

from libzkp_tpu.ops.mimc import (
    MIMC_ROUNDS,
    fr_from_commitment,
    fr_to_commitment,
    mimc_constants,
    mimc_hash_batch,
    mimc_hash_native,
)
from libzkp_tpu.utils.commitment import commit_value, commit_value_snark


def test_rounds():
    assert MIMC_ROUNDS == 110
    assert len(mimc_constants()) == 110


def test_deterministic():
    assert mimc_hash_native(42) == mimc_hash_native(42)
    assert mimc_hash_native(42) != mimc_hash_native(43)


def test_fr_commitment_roundtrip():
    f = mimc_hash_native(123)
    b = fr_to_commitment(f)
    assert len(b) == 32
    assert fr_from_commitment(b) == f


def test_commit_value_snark_is_32_bytes():
    c = commit_value_snark(42)
    assert len(c) == 32
    assert c == fr_to_commitment(mimc_hash_native(42))


def test_commit_value_sha256():
    import hashlib

    assert commit_value(7) == hashlib.sha256((7).to_bytes(8, "little")).digest()


def test_batch_matches_native():
    values = [0, 1, 42, 43, 2**64 - 1, 123456789]
    batch = mimc_hash_batch(values)
    native = [mimc_hash_native(v) for v in values]
    assert batch == native
