"""Radix-2 NTT / polynomial engine.

Replaces the reference's delegated polynomial math (winterfell LDE at
``stark.rs:113-114,119-127``; ark-poly QAP domains inside ark-groth16, SURVEY.md §2.2)
with two tiers:

* Host golden model on Python ints (exact, any field with enough 2-adicity).
* TPU batched limb NTT (:func:`ntt_device`): many polynomials transformed at
  once; butterfly stages are data-parallel over the batch axis and shard over
  the mesh ``dp`` axis. Montgomery-domain twiddles are precomputed per field.
"""

from __future__ import annotations

import functools
from typing import List

import jax
import jax.numpy as jnp

from .field import PrimeField
from .limb import LimbContext, get_context


# ---------------------------------------------------------------------------
# Host tier
# ---------------------------------------------------------------------------

def _bit_reverse_permute(a: List[int]) -> List[int]:
    n = len(a)
    bits = n.bit_length() - 1
    out = list(a)
    for i in range(n):
        j = int(bin(i)[2:].zfill(bits)[::-1], 2)
        if j > i:
            out[i], out[j] = out[j], out[i]
    return out


def ntt(F: PrimeField, values: List[int], invert: bool = False) -> List[int]:
    """In-order iterative radix-2 NTT over the size-n root-of-unity domain."""
    n = len(values)
    assert n & (n - 1) == 0, "size must be a power of two"
    p = F.p
    a = _bit_reverse_permute([v % p for v in values])
    root = F.root_of_unity(n)
    if invert:
        root = F.inv(root)
    length = 2
    while length <= n:
        w_len = pow(root, n // length, p)
        for start in range(0, n, length):
            w = 1
            half = length // 2
            for k in range(start, start + half):
                u = a[k]
                v = a[k + half] * w % p
                a[k] = (u + v) % p
                a[k + half] = (u - v) % p
                w = w * w_len % p
        length *= 2
    if invert:
        n_inv = F.inv(n)
        a = [x * n_inv % p for x in a]
    return a


ntt_py = ntt

from .. import native as _native  # noqa: E402

if _native.HAVE_NATIVE:

    def ntt(F: PrimeField, values: List[int], invert: bool = False) -> List[int]:  # noqa: F811
        n = len(values)
        assert n & (n - 1) == 0, "size must be a power of two"
        if n == 1:
            return [values[0] % F.p]
        # Domains too large for one chip split over the mesh `shard` axis
        # (four-step all_to_all NTT); declined below the size gate.
        sharded = maybe_ntt_sharded(F.p, values, invert=invert)
        if sharded is not None:
            return sharded
        root = F.root_of_unity(n)
        if invert:
            return _native.ntt(F.p, values, F.inv(root), F.inv(n))
        return _native.ntt(F.p, values, root, None)


def interpolate(F: PrimeField, evals: List[int]) -> List[int]:
    """Coefficients of the poly whose evaluations over the size-n domain are ``evals``."""
    return ntt(F, evals, invert=True)


def evaluate(F: PrimeField, coeffs: List[int], domain_size: int) -> List[int]:
    """Evaluate over the root-of-unity domain of ``domain_size`` (>= len(coeffs))."""
    padded = list(coeffs) + [0] * (domain_size - len(coeffs))
    return ntt(F, padded)


def evaluate_coset(F: PrimeField, coeffs: List[int], domain_size: int, offset: int) -> List[int]:
    """Evaluate over the coset ``offset * <g_n>`` (the LDE domain)."""
    p = F.p
    shifted = []
    power = 1
    for c in coeffs:
        shifted.append(c * power % p)
        power = power * offset % p
    return evaluate(F, shifted, domain_size)


def interpolate_coset(F: PrimeField, evals: List[int], offset: int) -> List[int]:
    """Inverse of :func:`evaluate_coset` on a full coset evaluation vector."""
    p = F.p
    coeffs = ntt(F, evals, invert=True)
    inv_off = F.inv(offset)
    out = []
    power = 1
    for c in coeffs:
        out.append(c * power % p)
        power = power * inv_off % p
    return out


def poly_eval(F: PrimeField, coeffs: List[int], x: int) -> int:
    """Horner evaluation at a single point."""
    acc = 0
    for c in reversed(coeffs):
        acc = (acc * x + c) % F.p
    return acc


def poly_degree(coeffs: List[int]) -> int:
    for i in range(len(coeffs) - 1, -1, -1):
        if coeffs[i] != 0:
            return i
    return 0


# ---------------------------------------------------------------------------
# TPU tier — batched NTT over limb arrays
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=None)
def _twiddle_table(p: int, n: int, invert: bool):
    """Per-stage Montgomery twiddles, shape (log n, n//2, limbs), host numpy.

    Pure host computation (no jax ops) so it is safe to call from inside a
    trace; the result is closed over as a constant.
    """
    import numpy as np

    from .limb import LIMB_BITS, _int_to_limbs

    F = PrimeField(p, "tw")
    ctx = get_context(p, "tw")
    root = F.root_of_unity(n)
    if invert:
        root = F.inv(root)
    R_mont = ctx.R
    stages = []
    length = 2
    while length <= n:
        w_len = pow(root, n // length, p)
        ws = []
        w = 1
        for _ in range(length // 2):
            ws.append(w)
            w = w * w_len % p
        stages.append(ws * (n // length))  # tile across butterfly lanes
        length *= 2
    out = np.zeros((len(stages), n // 2, ctx.n), dtype=np.int32)
    for si, stage in enumerate(stages):
        for wi, w in enumerate(stage):
            out[si, wi] = _int_to_limbs(w * R_mont % p, ctx.n)
    return out


def _bitrev_indices(n: int):
    import numpy as np

    bits = n.bit_length() - 1
    idx = np.arange(n)
    rev = np.zeros(n, dtype=np.int32)
    for b in range(bits):
        rev |= ((idx >> b) & 1) << (bits - 1 - b)
    return rev


def ntt_device(ctx: LimbContext, values_mont: jnp.ndarray, invert: bool = False) -> jnp.ndarray:
    """Batched NTT on Montgomery-domain limb arrays.

    ``values_mont``: (..., n_points, n_limbs). All leading axes are batch.
    Stages run as vectorized butterflies; sharding the batch axis across the
    mesh gives the multi-chip NTT path (SURVEY.md §2.3 "NTT engine").
    """
    import numpy as np

    n = values_mont.shape[-2]
    tw = jnp.asarray(_twiddle_table(ctx.p, n, invert))  # (stages, n//2, limbs)
    rev = jnp.asarray(_bitrev_indices(n))
    a = jnp.take(values_mont, rev, axis=-2)
    log_n = n.bit_length() - 1
    for s in range(log_n):
        length = 2 << s
        half = length >> 1
        # reshape into (..., n//length, length, limbs)
        shape = a.shape[:-2] + (n // length, length, ctx.n)
        blk = a.reshape(shape)
        u = blk[..., :half, :]
        v = blk[..., half:, :]
        w = tw[s].reshape(n // length, half, ctx.n)
        v = ctx.mont_mul(v, w)
        top = ctx.add(u, v)
        bot = ctx.sub(u, v)
        a = jnp.concatenate([top, bot], axis=-2).reshape(values_mont.shape)
        # Butterfly tops accumulate ~1.2p per stage in the relaxed signed
        # representation; fold back under 2p every few stages.
        if s % 4 == 3 and s != log_n - 1:
            a = ctx.reduce(a)
    if invert:
        F = PrimeField(ctx.p, "tmp")
        n_inv_mont = ctx.to_mont(ctx.encode_scalar(F.inv(n)))
        a = ctx.mont_mul(a, n_inv_mont)
    return a


@functools.lru_cache(maxsize=None)
def _ntt_jitted(p: int, invert: bool):
    ctx = get_context(p)
    return jax.jit(lambda x: ntt_device(ctx, x, invert))


def ntt_batch(ctx: LimbContext, values_mont: jnp.ndarray, invert: bool = False) -> jnp.ndarray:
    """Jit-compiled batched NTT (compiled once per (field, direction, shape))."""
    return _ntt_jitted(ctx.p, invert)(values_mont)


# ---------------------------------------------------------------------------
# Intra-NTT sharding: one transform split across chips (SURVEY §2.3 "NTT
# engine ... butterfly stages with all_to_all"). Four-step (Bailey)
# decomposition N = N1*N2: size-N1 column transforms local to each shard,
# a twiddle scaling, ONE all_to_all transpose over the `shard` mesh axis,
# then size-N2 row transforms local again. This is the path that lets a
# single proof's domain exceed one chip's memory/compute.
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=8)
def _four_step_twiddles(p: int, n1: int, n2: int, invert: bool):
    """(N2, N1) table of w^{±j2*k1} in Montgomery limb form (host numpy)."""
    import numpy as np

    from .limb import _int_to_limbs

    F = PrimeField(p, "tw4")
    ctx = get_context(p)
    w = F.root_of_unity(n1 * n2)
    if invert:
        w = F.inv(w)
    out = np.zeros((n2, n1, ctx.n), dtype=np.int32)
    for j2 in range(n2):
        wj = pow(w, j2, p)
        cur = 1
        for k1 in range(n1):
            out[j2, k1] = _int_to_limbs(cur * ctx.R % p, ctx.n)
            cur = cur * wj % p
    return out


@functools.lru_cache(maxsize=8)
def _ntt_sharded_jitted(p: int, n1: int, n2: int, invert: bool, mesh):
    from jax import shard_map
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ..parallel import collective

    ctx = get_context(p)

    def step(xl: jnp.ndarray, twl: jnp.ndarray) -> jnp.ndarray:
        # xl: (N2/P, N1, limbs) — rows j2 local, columns j1 complete
        xm = ctx.to_mont(xl)
        b = ntt_device(ctx, xm, invert=invert)  # size-N1 transforms, local
        b = ctx.mont_mul(b, twl)  # twiddle w^{j2*k1}
        # transpose across the mesh: (N2/P, N1) -> (N2, N1/P)
        c = collective.all_to_all(b, "shard", split_axis=1, concat_axis=0)
        c = jnp.transpose(c, (1, 0, 2))  # (N1/P, N2, limbs)
        d = ntt_device(ctx, c, invert=invert)  # size-N2 transforms, local
        return ctx.from_mont(d)

    return jax.jit(
        shard_map(
            step,
            mesh=mesh,
            in_specs=(P("shard"), P("shard")),
            out_specs=P("shard"),
            check_vma=False,
        )
    )


def ntt_sharded(p: int, values, mesh, invert: bool = False):
    """One size-N NTT split over the mesh ``shard`` axis; returns int list.

    Requires N = N1*N2 with both factors divisible by the shard count (i.e.
    N >= shard_count^2). Bit-exact against the host :func:`ntt` model
    (asserted by ``__graft_entry__.dryrun_multichip`` on the virtual mesh).
    Engaged by the STARK prover for domains at or above
    ``LIBZKP_NTT_SHARD_MIN`` (see :func:`maybe_ntt_sharded`).
    """
    ctx = get_context(p)
    N = len(values)
    assert N & (N - 1) == 0, "N must be a power of two"
    P_sh = mesh.shape["shard"]
    lg = N.bit_length() - 1
    n1 = 1 << (lg // 2)
    n2 = N // n1
    if n1 % P_sh or n2 % P_sh:
        n1 = max(n1, P_sh)
        n2 = N // n1
    assert n1 % P_sh == 0 and n2 % P_sh == 0, "N too small for this mesh"
    import numpy as np

    from jax.sharding import NamedSharding, PartitionSpec as Pspec

    # A[j2][j1] = x[j1*N2 + j2]
    x = ctx.encode(list(values)).reshape(n1, n2, ctx.n)
    x = jnp.transpose(x, (1, 0, 2))  # (N2, N1, limbs), shard over j2
    tw = jnp.asarray(_four_step_twiddles(p, n1, n2, invert))
    x = jax.device_put(x, NamedSharding(mesh, Pspec("shard")))
    tw = jax.device_put(tw, NamedSharding(mesh, Pspec("shard")))
    out = _ntt_sharded_jitted(p, n1, n2, invert, mesh)(x, tw)  # (N1, N2, limbs)
    m = ctx.decode(out)  # row-major (k1, k2)
    # X[N1*k2 + k1] = M[k1][k2]
    res = [0] * N
    for k1 in range(n1):
        row = k1 * n2
        for k2 in range(n2):
            res[n1 * k2 + k1] = m[row + k2]
    return res


def maybe_ntt_sharded(p: int, values, invert: bool = False):
    """Production gate for the intra-NTT sharded path: engages when the
    domain is at least ``LIBZKP_NTT_SHARD_MIN`` (default 2^18) and a
    multi-device mesh is up; returns None otherwise (caller runs the local
    tier). One proof's domain is no longer bounded by one chip."""
    import os

    # Opt-in only (set LIBZKP_NTT_SHARD_MIN to a domain size to engage):
    # measured round 4 (BASELINE.md "Sharded NTT"), a single tunneled chip
    # cannot beat the fixed host tier on any reachable domain — the limb
    # encoding is ~1.5x the canonical bytes and the ~80 MB/s tunnel makes
    # even a 2^18 transform transfer-bound (~320 ms moving data vs ~400 ms
    # host compute), while this library's largest production domain is 1024.
    # The capability itself (four-step all_to_all decomposition) is
    # dryrun-validated bit-exact at every mesh size and is the pod-scale
    # path, where chips are PCIe/ICI-attached and domains can be huge.
    min_env = os.environ.get("LIBZKP_NTT_SHARD_MIN")
    if min_env is None:
        return None
    try:
        min_n = int(min_env)
    except ValueError:
        return None
    if len(values) < max(min_n, 4):
        return None
    from ..parallel import mesh as meshmod

    if not meshmod.use_mesh():
        return None
    mesh = meshmod.get_mesh()
    P_sh = mesh.shape["shard"]
    if P_sh < 2 or len(values) < P_sh * P_sh:
        return None
    try:
        return ntt_sharded(p, values, mesh, invert=invert)
    except Exception:
        import logging

        logging.getLogger(__name__).warning(
            "ntt_sharded failed for n=%d over %d-way shard axis; "
            "degrading to the local tier",
            len(values),
            P_sh,
            exc_info=True,
        )
        return None


@functools.lru_cache(maxsize=None)
def _coset_lde_jitted(p: int, n: int, blowup: int, offset: int):
    """Batched interpolate -> coset-shift -> low-degree-extend, one jit."""
    import numpy as np

    from .limb import _int_to_limbs

    ctx = get_context(p)
    off_pows = np.stack(
        [_int_to_limbs(pow(offset, i, p) * ctx.R % p, ctx.n) for i in range(n)]
    )  # (n, limbs) Montgomery

    def run(x_canonical: jnp.ndarray):  # (B, n, limbs)
        xm = ctx.to_mont(x_canonical)
        coeffs_m = ntt_device(ctx, xm, invert=True)
        shifted = ctx.mont_mul(coeffs_m, jnp.asarray(off_pows))
        padded = jnp.pad(shifted, ((0, 0), (0, n * (blowup - 1)), (0, 0)))
        lde_m = ntt_device(ctx, padded, invert=False)
        return ctx.from_mont(coeffs_m), ctx.from_mont(lde_m)

    return jax.jit(run)


def coset_lde_batch(p: int, traces, blowup: int, offset: int, mesh=None):
    """Batch of size-n traces -> ([coeff lists], [LDE lists]) in one device
    round-trip (the STARK batch prover's hot op, SURVEY.md §2.3 "NTT engine").

    The batch axis is padded to a power of two so the kernel compiles once
    per size bucket. With >1 visible device (or an explicit ``mesh``) the
    batch is laid out across the ``dp`` mesh axis and the jit runs SPMD.
    """
    ctx = get_context(p)
    B = len(traces)
    n = len(traces[0])
    padded_b = max(16, 1 << (B - 1).bit_length())
    flat = [v for t in traces for v in t] + [0] * (n * (padded_b - B))
    x = ctx.encode(flat).reshape(padded_b, n, ctx.n)
    if mesh is None:
        from ..parallel import mesh as meshmod

        if meshmod.use_mesh():
            mesh = meshmod.get_mesh()
    if mesh is not None and mesh.size > 1:
        if padded_b % mesh.shape["dp"] == 0:
            from ..parallel.mesh import dp_sharding

            x = jax.device_put(x, dp_sharding(mesh))
        else:
            import logging

            logging.getLogger(__name__).info(
                "coset_lde_batch: batch %d (padded %d) not divisible by dp=%d;"
                " running single-device",
                B, padded_b, mesh.shape["dp"],
            )
    coeffs, lde = _coset_lde_jitted(p, n, blowup, offset)(x)
    coeff_ints = ctx.decode(coeffs)
    lde_ints = ctx.decode(lde)
    N = n * blowup
    polys = [coeff_ints[i * n : (i + 1) * n] for i in range(B)]
    ldes = [lde_ints[i * N : (i + 1) * N] for i in range(B)]
    return polys, ldes
