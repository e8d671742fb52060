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
