"""Unit tests for the multi-host bootstrap helper (VERDICT r4 #6).

A real ``jax.distributed.initialize`` needs a coordinator process; these
tests pin the *decision logic* — env fallbacks, the single-host no-op, and
idempotence — by stubbing the initialize call.
"""

from __future__ import annotations

import jax

from libzkp_tpu.parallel import mesh as meshmod


class _Spy:
    def __init__(self):
        self.calls = []

    def __call__(self, coordinator_address=None, num_processes=None, process_id=None):
        self.calls.append((coordinator_address, num_processes, process_id))


def _with_stub(monkeypatch):
    spy = _Spy()
    monkeypatch.setattr(jax.distributed, "initialize", spy)
    monkeypatch.setattr(meshmod, "_distributed_initialized", False)
    return spy


def test_single_host_noop(monkeypatch):
    spy = _with_stub(monkeypatch)
    for var in (
        "JAX_COORDINATOR_ADDRESS",
        "COORDINATOR_ADDRESS",
        "TPU_WORKER_HOSTNAMES",
    ):
        monkeypatch.delenv(var, raising=False)
    assert meshmod.init_distributed() is False
    assert spy.calls == []
    assert meshmod._distributed_initialized is False


def test_explicit_args(monkeypatch):
    spy = _with_stub(monkeypatch)
    assert meshmod.init_distributed("10.0.0.1:1234", 4, 2) is True
    assert spy.calls == [("10.0.0.1:1234", 4, 2)]
    assert meshmod._distributed_initialized is True


def test_env_fallback(monkeypatch):
    spy = _with_stub(monkeypatch)
    monkeypatch.setenv("JAX_COORDINATOR_ADDRESS", "head:8476")
    monkeypatch.setenv("JAX_NUM_PROCESSES", "8")
    monkeypatch.setenv("JAX_PROCESS_ID", "3")
    assert meshmod.init_distributed() is True
    assert spy.calls == [("head:8476", 8, 3)]


def test_idempotent(monkeypatch):
    spy = _with_stub(monkeypatch)
    assert meshmod.init_distributed("head:1", 2, 0) is True
    assert meshmod.init_distributed("head:1", 2, 0) is True
    assert len(spy.calls) == 1


def test_mesh_cache_cleared_on_init(monkeypatch):
    _with_stub(monkeypatch)
    m1 = meshmod.get_mesh()
    meshmod.init_distributed("head:1", 2, 0)
    # cache was cleared: a fresh construction happens (same devices here,
    # but the lru entry is gone)
    assert meshmod.get_mesh.cache_info().currsize == 0 or meshmod.get_mesh() is not m1
