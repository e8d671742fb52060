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
* ``LIBZKP_DEVICE_MSM_MIN_B`` / ``LIBZKP_DEVICE_MSM_MIN_K`` — hard floors on
  batch lanes / basis size below which the device is never consulted.
* ``LIBZKP_DEVICE_MSM_CHUNK_B`` — lanes per device dispatch; bigger batches
  split into chunks so the compiled-shape set stays bounded. Default 512.

Implicit engagement is **measurement-gated**: unless ``LIBZKP_DEVICE_MSM=1``
forces the device, ``try_device`` only fires when the autotune record
(``scripts/autotune_msm.py`` → ``~/.cache/libzkp_tpu/msm_autotune.json``)
says the device *measured faster than the host tier* for the bucketed
(curve, K, B) shape class on this machine. Round-2 lesson: a tunneled v5e
pays ~3 minutes of XLA compile the first time a shape class is seen and,
warm, ran 0.48 ms/lane vs the host tier's 0.34 ms/lane at (ed25519, K=129,
B=340) — engaging it blind regressed the whole batch bench. The autotune
script pays the compiles explicitly and records who actually won; production
dispatch then never eats an unamortized compile or a known loss.

Lane counts are padded up to power-of-two buckets before dispatch so the
compiled-shape set stays small and reusable across nearby batch sizes.

Multiples tables are cached per basis (bounded LRU) — every basis on the
prove path is process-constant (generator vectors, proving-key query
vectors), exactly like the native tier's BGMW table registry.
"""

from __future__ import annotations

import json
import os
import threading
from collections import OrderedDict
from typing import List, Optional, Sequence

_TABLES: "OrderedDict" = OrderedDict()
_MAX_TABLES = 16  # each entry holds a large device array; bound the cache
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


def _forced() -> bool:
    return os.environ.get("LIBZKP_DEVICE_MSM") == "1"


# ---------------------------------------------------------------------------
# measured autotune record
# ---------------------------------------------------------------------------

def tune_path() -> str:
    return os.environ.get(
        "LIBZKP_MSM_TUNE_FILE",
        os.path.expanduser("~/.cache/libzkp_tpu/msm_autotune.json"),
    )


def shape_key(curve: str, k: int, b: int) -> str:
    """Bucketed shape class: K and B rounded up to powers of two."""
    kb = 1 << max(0, (k - 1)).bit_length()
    bb = 1 << max(0, (b - 1)).bit_length()
    return f"{curve}:K{kb}:B{bb}"


def _load_tune() -> dict:
    global _tune_cache
    if _tune_cache is not None:
        return _tune_cache
    try:
        with open(tune_path()) as f:
            _tune_cache = json.load(f)
    except (OSError, ValueError):
        _tune_cache = {}
    return _tune_cache


_tune_cache: Optional[dict] = None


def save_tune(entries: dict) -> None:
    """Merge autotune measurements into the on-disk record (autotune script)."""
    global _tune_cache
    path = tune_path()
    os.makedirs(os.path.dirname(path), exist_ok=True)
    cur = {}
    try:
        with open(path) as f:
            cur = json.load(f)
    except (OSError, ValueError):
        pass
    cur.update(entries)
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(cur, f, indent=1, sort_keys=True)
    os.replace(tmp, path)
    _tune_cache = cur


def _tuned_win(curve: str, k: int, b: int) -> bool:
    entry = _load_tune().get(shape_key(curve, k, b))
    return bool(entry and entry.get("wins"))


def _get_table(curve: str, points: Sequence):
    # Key by value: callers often rebuild the same basis list per call
    # (e.g. ``[B_blinding] + G + H``); the table must be reused across those.
    key = (curve, tuple(points))
    with _LOCK:
        tbl = _TABLES.get(key)
        if tbl is not None:
            _TABLES.move_to_end(key)
            return tbl
    configure_jax()
    from . import curve_jax as cj

    build = {
        "ed25519": cj.build_table_ed25519,
        "bn254_g1": cj.build_table_bn254_g1,
        "bn254_g2": cj.build_table_bn254_g2,
    }[curve]
    table = build(list(points))
    with _LOCK:
        _TABLES[key] = table
        while len(_TABLES) > _MAX_TABLES:
            _TABLES.popitem(last=False)
    return table


def _dispatch(table, scalar_vecs: Sequence[Sequence[int]]) -> List:
    """Chunked + power-of-two padded msm_many so compiled shapes stay few."""
    from . import curve_jax as cj

    chunk = max(_env_int("LIBZKP_DEVICE_MSM_CHUNK_B", 512), 1)
    out: List = []
    for i in range(0, len(scalar_vecs), chunk):
        part = list(scalar_vecs[i : i + chunk])
        b = len(part)
        padded = 1 << max(0, (b - 1)).bit_length()
        if padded > b:
            zero = [0] * len(part[0])
            part = part + [zero] * (padded - b)
        out.extend(cj.msm_many(table, part)[:b])
    return out


def try_device(
    curve: str, scalar_vecs: Sequence[Sequence[int]], points: Sequence
) -> Optional[List]:
    """Run a fixed-basis MSM batch on the device, or return None to decline.

    Returns host-representation points (extended Edwards / Jacobian G1 /
    Jacobian G2) exactly like the host tiers. Without ``LIBZKP_DEVICE_MSM=1``
    this only engages shape classes the autotune record measured as device
    wins on this machine (see module docstring).
    """
    if not enabled():
        return None
    min_b, min_k = _thresholds()
    if len(scalar_vecs) < min_b or len(points) < min_k:
        return None
    if not _forced() and not _tuned_win(curve, len(points), len(scalar_vecs)):
        return None
    try:
        table = _get_table(curve, points)
        if _use_mesh():
            from . import curve_jax as cj
            from ..parallel import mesh as meshmod

            return cj.msm_many_sharded(table, scalar_vecs, mesh=meshmod.get_mesh())
        return _dispatch(table, scalar_vecs)
    except Exception:
        if _forced():
            raise  # forced mode surfaces bugs instead of silently hiding them
        return None


def _use_mesh() -> bool:
    """Back-compat alias; see :func:`libzkp_tpu.parallel.mesh.use_mesh`."""
    from ..parallel.mesh import use_mesh

    return use_mesh()
