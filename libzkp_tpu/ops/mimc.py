"""MiMC-5 hash over BN254 Fr.

Semantics mirror the Rust reference (``/root/reference/src/backend/snark.rs:182-221``):

* 110 rounds of ``x <- (x + c_i)^5`` over BN254 Fr.
* Round constants: ``SHA256(b"libzkp_mimc_v1:" || u64_le(i))`` reduced from LE
  bytes mod r (``snark.rs:186-198``).
* 32-byte commitments are the canonical little-endian Fr serialization
  (``fr_to_commitment``, snark.rs:214-221).

Two tiers:

* :func:`mimc_hash_native` — host scalar path (single commitment latency).
* :func:`mimc_hash_batch` — jitted TPU path, vmap-free batched limb kernel;
  used by the sharded batch prover for high-throughput commitment streams.
"""

from __future__ import annotations

import functools
import hashlib

import jax
import jax.numpy as jnp

from .field import BN254_FR
from .limb import get_context

MIMC_ROUNDS = 110


@functools.lru_cache(maxsize=1)
def mimc_constants() -> tuple:
    """Round constants as Python ints (bit-exact vs snark.rs:186-198)."""
    out = []
    for i in range(MIMC_ROUNDS):
        h = hashlib.sha256(b"libzkp_mimc_v1:" + i.to_bytes(8, "little")).digest()
        out.append(BN254_FR.from_le_bytes_mod(h))
    return tuple(out)


# Memo shared with the device-batched path: the batch prover primes it so
# per-proof commitment recomputation is a dict hit.
_native_memo: dict = {}


def mimc_hash_native(value: int) -> int:
    """Host-scalar MiMC-5 (matches ``mimc_hash_native``, snark.rs:201-211)."""
    p = BN254_FR.p
    x0 = value % p
    hit = _native_memo.get(x0)
    if hit is not None:
        return hit
    x = x0
    for c in mimc_constants():
        t = (x + c) % p
        x = pow(t, 5, p)
    if len(_native_memo) > 1 << 16:
        _native_memo.clear()
    _native_memo[x0] = x
    return x


def prime_mimc_memo(values, digests) -> None:
    """Feed device-batch results into the host memo (batch prover hook)."""
    p = BN254_FR.p
    for v, d in zip(values, digests):
        _native_memo[int(v) % p] = int(d)


def fr_to_commitment(f: int) -> bytes:
    """Canonical 32-byte LE serialization of an Fr element (snark.rs:214-221)."""
    return int(f).to_bytes(32, "little")


def fr_from_commitment(data: bytes):
    """Inverse of :func:`fr_to_commitment`; ``None`` if non-canonical."""
    if len(data) != 32:
        return None
    return BN254_FR.from_le_bytes_canonical(data)


# ---------------------------------------------------------------------------
# TPU batched path
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=1)
def _mont_constants():
    """(110, n) round constants in Montgomery form (host numpy, trace-safe)."""
    import numpy as np

    from .limb import _int_to_limbs

    ctx = get_context(BN254_FR.p, "bn254_fr")
    out = np.zeros((MIMC_ROUNDS, ctx.n), dtype=np.int32)
    for i, c in enumerate(mimc_constants()):
        out[i] = _int_to_limbs(c * ctx.R % ctx.p, ctx.n)
    return out


def _mimc_batch_impl(x_limbs: jnp.ndarray, constants: jnp.ndarray) -> jnp.ndarray:
    """Core loop on Montgomery-domain limb arrays. x: (B, n); constants (110, n)."""
    ctx = get_context(BN254_FR.p, "bn254_fr")

    def round_fn(x, c):
        t = ctx.add(x, c)
        return ctx.mont_pow5(t), None

    x, _ = jax.lax.scan(round_fn, x_limbs, constants)
    return x


@functools.partial(jax.jit, static_argnames=())
def _mimc_batch_jit(x_canonical: jnp.ndarray, constants: jnp.ndarray) -> jnp.ndarray:
    ctx = get_context(BN254_FR.p, "bn254_fr")
    xm = ctx.to_mont(x_canonical)
    out = _mimc_batch_impl(xm, constants)
    return ctx.from_mont(out)


def mimc_hash_batch(values, mesh=None) -> list:
    """Batched MiMC-5 of u64 values on the accelerator; returns Python ints.

    The batch is zero-padded to the next power of two (min 16) so the jitted
    kernel compiles once per size bucket instead of once per exact shape —
    compiles over a TPU tunnel are expensive. With >1 visible device (or an
    explicit ``mesh``) the batch is laid out across the ``dp`` mesh axis and
    the same jit runs SPMD — the sharded-batch-prover tier of SURVEY.md §2.3.
    """
    ctx = get_context(BN254_FR.p, "bn254_fr")
    vals = [int(v) for v in values]
    n = len(vals)
    padded = max(16, 1 << (n - 1).bit_length()) if n else 16
    x = ctx.encode(vals + [0] * (padded - n))
    if mesh is None:
        from ..parallel import mesh as meshmod

        if meshmod.use_mesh():
            mesh = meshmod.get_mesh()
    if mesh is not None and mesh.size > 1 and padded % mesh.shape["dp"] == 0:
        from ..parallel.mesh import dp_sharding

        x = jax.device_put(x, dp_sharding(mesh))
    consts = jnp.asarray(_mont_constants())
    out = _mimc_batch_jit(x, consts)
    return ctx.decode(out)[:n]


def mimc_batch_device(x_canonical: jnp.ndarray) -> jnp.ndarray:
    """Device-resident variant for fusion into larger pipelines.

    ``x_canonical``: (B, n) canonical limbs -> (B, n) canonical MiMC digests.
    """
    return _mimc_batch_jit(x_canonical, jnp.asarray(_mont_constants()))
