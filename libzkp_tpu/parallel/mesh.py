"""Device mesh management.

One global mesh with a ``dp`` (data/batch) axis and a ``shard`` (intra-proof)
axis — the component inventory's "Device mesh & runtime" (SURVEY.md §2.3).
On a pod slice, ``dp`` rides DCN-friendly outer dimensions and ``shard``
stays within ICI; with one chip both axes are 1 and everything still jits.
"""

from __future__ import annotations

import functools
import os
from typing import Optional, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


_distributed_initialized = False


def init_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """Multi-host process bootstrap (SURVEY.md §5 "Distributed comm backend").

    Wraps ``jax.distributed.initialize`` so a pod-slice deployment is one
    call (or zero: every argument falls back to the standard env vars —
    ``JAX_COORDINATOR_ADDRESS``/``COORDINATOR_ADDRESS``, ``JAX_NUM_PROCESSES``,
    ``JAX_PROCESS_ID`` — and on Cloud TPU ``jax.distributed.initialize()``
    auto-discovers all three). No-op when single-host: returns False when no
    coordinator is configured or discoverable, True once the process group is
    up. Call before the first :func:`get_mesh` so ``jax.devices()`` spans the
    slice. Idempotent; safe under concurrent callers holding the GIL.

    Replaces the reference's absent multi-process story (its only
    inter-process mechanism is the flock'd batch store,
    ``advanced/batch_store.rs:102-140``) with the JAX-native process group
    over ICI/DCN.
    """
    global _distributed_initialized
    if _distributed_initialized:
        return True
    addr = (
        coordinator_address
        or os.environ.get("JAX_COORDINATOR_ADDRESS")
        or os.environ.get("COORDINATOR_ADDRESS")
    )
    n_str = os.environ.get("JAX_NUM_PROCESSES")
    pid_str = os.environ.get("JAX_PROCESS_ID")
    if num_processes is None and n_str is not None:
        num_processes = int(n_str)
    if process_id is None and pid_str is not None:
        process_id = int(pid_str)
    # Cloud TPU pod auto-discovery: TPU_WORKER_HOSTNAMES lists every host in
    # the slice. One entry (single host, incl. the 'localhost' some PJRT
    # plugins set) is not a pod.
    hostnames = os.environ.get("TPU_WORKER_HOSTNAMES", "")
    on_tpu_pod = (
        jax.default_backend() == "tpu" and len(hostnames.split(",")) > 1
    )
    if addr is None and not on_tpu_pod:
        return False  # single-host: nothing to do
    try:
        jax.distributed.initialize(
            coordinator_address=addr,
            num_processes=num_processes,
            process_id=process_id,
        )
    except RuntimeError:
        if addr is None:
            # auto-discovery raced an already-initialized backend; stay
            # single-host rather than crash a working process
            return False
        raise
    _distributed_initialized = True
    get_mesh.cache_clear()  # a pre-init mesh only saw local devices
    return True


@functools.lru_cache(maxsize=None)
def get_mesh(dp: Optional[int] = None, shard: int = 1) -> Mesh:
    """Global (dp, shard) mesh over all visible devices.

    ``dp`` defaults to n_devices // shard. Multi-host: call
    ``jax.distributed.initialize`` before first use; ``jax.devices()`` then
    spans the pod slice and the same construction applies.
    """
    devices = jax.devices()
    n = len(devices)
    if dp is None:
        dp = n // shard
    assert dp * shard <= n, f"mesh {dp}x{shard} exceeds {n} devices"
    arr = np.asarray(devices[: dp * shard]).reshape(dp, shard)
    return Mesh(arr, ("dp", "shard"))


def dp_sharding(mesh: Mesh) -> NamedSharding:
    """Batch-axis sharding: leading dim split across ``dp``."""
    return NamedSharding(mesh, P("dp"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def num_dp(mesh: Optional[Mesh] = None) -> int:
    mesh = mesh or get_mesh()
    return mesh.shape["dp"]


def pad_to_multiple(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


def use_mesh() -> bool:
    """Should batch primitives shard over the global mesh?

    ``LIBZKP_MESH_SHARDED=1/0`` forces it (CPU virtual-mesh tests force on).
    By default sharding engages when more than one accelerator device is
    visible. Single-chip fallbacks inside the sharded kernels make either
    answer safe.
    """
    flag = os.environ.get("LIBZKP_MESH_SHARDED")
    if flag == "0":
        return False
    if flag == "1":
        return True
    try:
        return jax.default_backend() != "cpu" and len(jax.devices()) > 1
    except Exception:
        return False
