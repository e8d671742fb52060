"""Device-MSM dispatch seam: the prove path's ``msm_fixed_many`` wrappers
route large fixed-basis batches to the Pallas MSM engine and fall back to
the host tier otherwise. Forced mode (``LIBZKP_DEVICE_MSM=1``) runs the
identical code path on the CPU backend (interpret/eager kernels)."""

import random

import pytest

from libzkp_tpu.ops import bn254 as bn
from libzkp_tpu.ops import ed25519 as ed
from libzkp_tpu.ops import msm_device

random.seed(99)


@pytest.fixture
def forced_device(monkeypatch):
    monkeypatch.setenv("LIBZKP_DEVICE_MSM", "1")
    monkeypatch.setenv("LIBZKP_DEVICE_MSM_MIN_B", "2")
    monkeypatch.setenv("LIBZKP_DEVICE_MSM_MIN_K", "2")


def test_disabled_on_cpu_backend_by_default(monkeypatch):
    monkeypatch.delenv("LIBZKP_DEVICE_MSM", raising=False)
    assert not msm_device.enabled()
    monkeypatch.setenv("LIBZKP_DEVICE_MSM", "0")
    assert not msm_device.enabled()


def test_declines_below_thresholds(monkeypatch):
    monkeypatch.setenv("LIBZKP_DEVICE_MSM", "1")
    monkeypatch.setenv("LIBZKP_DEVICE_MSM_MIN_B", "64")
    pts = [ed.from_uniform_bytes(random.randbytes(64)) for _ in range(4)]
    assert msm_device.try_device("ed25519", [[1, 2, 3, 4]], pts) is None


def test_ed25519_seam_matches_host(forced_device):
    K, B = 6, 3
    pts = [ed.from_uniform_bytes(random.randbytes(64)) for _ in range(K)]
    vecs = [[random.randrange(ed.L) for _ in range(K)] for _ in range(B)]
    got = ed.msm_fixed_many(vecs, pts)
    for sv, g in zip(vecs, got):
        assert ed.point_equal(tuple(g), ed.msm_py(sv, pts))
    # table reuse across calls building an equal-valued basis list fresh
    n_tables = len(msm_device._TABLES)
    ed.msm_fixed_many(vecs, list(pts))
    assert len(msm_device._TABLES) == n_tables


def test_chunked_dispatch_matches_host(forced_device, monkeypatch):
    """Batches above LIBZKP_DEVICE_MSM_CHUNK_B split into bounded-shape
    device dispatches (keeps the compiled-shape set small)."""
    monkeypatch.setenv("LIBZKP_DEVICE_MSM_CHUNK_B", "2")
    K, B = 6, 5
    pts = [ed.from_uniform_bytes(random.randbytes(64)) for _ in range(K)]
    vecs = [[random.randrange(ed.L) for _ in range(K)] for _ in range(B)]
    got = ed.msm_fixed_many(vecs, pts)
    assert len(got) == B
    for sv, g in zip(vecs, got):
        assert ed.point_equal(tuple(g), ed.msm_py(sv, pts))


def test_bn254_g1_seam_matches_host(forced_device):
    K, B = 5, 3
    g = bn.g1_from_affine(bn.G1_GEN)
    pts = [bn.g1_scalar_mul(random.randrange(bn.R), g) for _ in range(K)]
    vecs = [[random.randrange(bn.R) for _ in range(K)] for _ in range(B)]
    got = bn.g1_msm_fixed_many(vecs, pts)
    for sv, gg in zip(vecs, got):
        want = bn.g1_msm(sv, pts)
        assert bn.g1_to_affine(tuple(gg)) == bn.g1_to_affine(want)


def test_range_prove_path_on_device(forced_device):
    """End-to-end: the lockstep batch prover's MSMs run on the device engine
    (8-bit width keeps the CPU eager path fast) and verify with the host."""
    from libzkp_tpu.models import bulletproofs as bp
    from libzkp_tpu.models.strobe import Transcript

    insts = [
        (Transcript(b"libzkp_range_min"), 7, 1234567, 8),
        (Transcript(b"libzkp_range_min"), 200, 7654321, 8),
    ]
    out = bp.prove_single_batch(insts)
    for (proof, V), (_, value, blinding, n) in zip(out, insts):
        t = Transcript(b"libzkp_range_min")
        assert bp.verify_single(proof, t, V, n)
