"""Device dispatch policy for fixed-basis MSM batches.

This is the seam that puts the Pallas MSM engine (:mod:`.curve_jax`) on the
prove path: the host tiers' ``msm_fixed_many`` wrappers
(:func:`libzkp_tpu.ops.ed25519.msm_fixed_many`,
:func:`libzkp_tpu.ops.bn254.g1_msm_fixed_many` / ``g2_msm_fixed_many``) call
:func:`try_device` first and fall back to the host path when it declines.
Replaces the CPU multi-exponentiation the reference consumes from
``curve25519-dalek`` / ``ark-ec`` (``/root/reference/src/backend/
bulletproofs.rs:138-158`` and the ark-groth16 query MSMs) for batch work.

Policy (env-tunable):

* ``LIBZKP_DEVICE_MSM`` — ``0`` disables the device tier entirely; ``1``
  forces it on even on the CPU backend (tests run the identical code path in
  Pallas interpret/eager mode on the 8-device virtual mesh).
* ``LIBZKP_DEVICE_MSM_MIN_B`` — minimum batch lanes (independent MSMs) before
  the device pays for its dispatch latency (one host->device round trip costs
  ~25 ms on a tunneled chip). Default 224.
* ``LIBZKP_DEVICE_MSM_MIN_K`` — minimum basis size; small bases (Pedersen
  pairs, 8-bit-range IPP bases) are cheaper on the host BGMW tables than the
  device's K-chunk-padded tree. Default 96.
* ``LIBZKP_DEVICE_MSM_CHUNK_B`` — lanes per device dispatch; bigger batches
  split into chunks so the compiled-shape set stays bounded (first-compile
  over a tunnel costs minutes; the persistent cache amortizes per machine,
  per shape). Default 512.

Measured on this host (2 vCPU, v5e via ~25 ms-RTT tunnel): the device path
is at parity with the 2-core C++ OMP tier inside the default band and loses
outside it — the win case is a co-located TPU (sub-ms dispatch, PCIe/ICI
transfer) and batch shapes like Groth16 query MSMs (K >= 352) over >= 224
distinct statements. See BASELINE.md "Device MSM engine".

Multiples tables are cached per basis object — every basis on the prove path
is process-constant (generator vectors, proving-key query vectors), exactly
like the native tier's BGMW table registry.
"""

from __future__ import annotations

import os
import threading
from typing import List, Optional, Sequence

_TABLES: dict = {}
_LOCK = threading.Lock()
_cfg_done = False


def _env_int(name: str, default: int) -> int:
    try:
        return int(os.environ.get(name, default))
    except ValueError:
        return default


def configure_jax() -> None:
    """Idempotent: point jax at a persistent compilation cache.

    The MSM/NTT graphs take minutes to compile on a tunneled TPU; the disk
    cache makes that a once-per-machine cost instead of once-per-process.
    """
    global _cfg_done
    if _cfg_done:
        return
    _cfg_done = True
    import jax

    path = os.environ.get(
        "JAX_COMPILATION_CACHE_DIR",
        os.path.expanduser("~/.cache/libzkp_tpu/jax"),
    )
    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass  # cache is an optimization; never fail a prove over it


def enabled() -> bool:
    flag = os.environ.get("LIBZKP_DEVICE_MSM")
    if flag == "0":
        return False
    if flag == "1":
        return True
    try:
        import jax

        return jax.default_backend() != "cpu"
    except Exception:
        return False


def _thresholds():
    return (
        _env_int("LIBZKP_DEVICE_MSM_MIN_B", 224),
        _env_int("LIBZKP_DEVICE_MSM_MIN_K", 96),
    )


def _get_table(curve: str, points: Sequence):
    # Key by value: callers often rebuild the same basis list per call
    # (e.g. ``[B_blinding] + G + H``); the table must be reused across those.
    key = (curve, tuple(points))
    tbl = _TABLES.get(key)
    if tbl is not None:
        return tbl
    with _LOCK:
        tbl = _TABLES.get(key)
        if tbl is not None:
            return tbl
        configure_jax()
        from . import curve_jax as cj

        build = {
            "ed25519": cj.build_table_ed25519,
            "bn254_g1": cj.build_table_bn254_g1,
            "bn254_g2": cj.build_table_bn254_g2,
        }[curve]
        table = build(list(points))
        _TABLES[key] = table
        return table


def try_device(
    curve: str, scalar_vecs: Sequence[Sequence[int]], points: Sequence
) -> Optional[List]:
    """Run a fixed-basis MSM batch on the device, or return None to decline.

    Returns host-representation points (extended Edwards / Jacobian G1 /
    Jacobian G2) exactly like the host tiers.
    """
    if not enabled():
        return None
    min_b, min_k = _thresholds()
    if len(scalar_vecs) < min_b or len(points) < min_k:
        return None
    try:
        table = _get_table(curve, points)
        from . import curve_jax as cj

        if _use_mesh():
            from ..parallel import mesh as meshmod

            return cj.msm_many_sharded(table, scalar_vecs, mesh=meshmod.get_mesh())
        chunk = max(_env_int("LIBZKP_DEVICE_MSM_CHUNK_B", 512), 1)
        if len(scalar_vecs) <= chunk:
            return cj.msm_many(table, scalar_vecs)
        out: List = []
        for i in range(0, len(scalar_vecs), chunk):
            out.extend(cj.msm_many(table, scalar_vecs[i : i + chunk]))
        return out
    except Exception:
        if os.environ.get("LIBZKP_DEVICE_MSM") == "1":
            raise  # forced mode surfaces bugs instead of silently hiding them
        return None


def _use_mesh() -> bool:
    """Shard MSM batches over the (dp, shard) mesh when >1 device is visible.

    ``LIBZKP_DEVICE_MSM_SHARDED`` forces it on (CPU virtual-mesh tests) or
    off. The single-chip fallback inside :func:`curve_jax.msm_many_sharded`
    makes this safe either way.
    """
    flag = os.environ.get("LIBZKP_DEVICE_MSM_SHARDED")
    if flag == "0":
        return False
    if flag == "1":
        return True
    try:
        import jax

        return jax.default_backend() != "cpu" and len(jax.devices()) > 1
    except Exception:
        return False
