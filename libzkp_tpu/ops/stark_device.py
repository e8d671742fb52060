"""Fused STARK device pipeline: trace LDE + BLAKE3 leaf commit in one program.

VERDICT r4 #5: the device STARK path did the LDE on chip but hashed the
Merkle leaves on host. This module canonicalizes the LDE output mod f128 ON
DEVICE, packs it to the 16-byte little-endian leaf messages winterfell
hashes (``hash_elements`` of one f128 element per trace row), and runs the
retiled BLAKE3 compress over every leaf of every proof in the batch — one
device dispatch for the whole batch's LDE + commit.

The per-proof Merkle levels above the leaves are 63 nearly-free native
merges on host (leaf hashing is 64/127 of the compressions and all of the
field-element byte work).

Canonicalization mod p = 2^128 - 45*2^40 + 1: values leave ``mont_mul`` in
(-p, 2p) relaxed limbs; strict digits + two folds of bits >= 128 through
e = 2^128 mod p = 45*2^40 - 1, then one conditional subtract via the
"v >= p iff v + e has bit 128" identity (p + e = 2^128).
"""

from __future__ import annotations

import functools
from typing import List, Sequence, Tuple

import numpy as np

from .field import F128
from .limbfold import backend_cached
from .limb import LIMB_BITS, LimbContext, _int_to_limbs, get_context

P128 = F128.p
E128 = (1 << 128) - P128  # 45*2^40 - 1
_T = 128
_TI = _T // LIMB_BITS  # 10: limb holding bit 128 (at offset 8)
_TOFF = _T % LIMB_BITS  # 8


@functools.lru_cache(maxsize=None)
def _canon_consts(n: int) -> Tuple[np.ndarray, np.ndarray]:
    """(bias 4p strict limbs, e strict limbs) for the f128 ctx."""
    return _int_to_limbs(4 * P128, n), _int_to_limbs(E128, n)


def canon_f128_device(ctx: LimbContext, x):
    """Relaxed (-p, 2p) limb values -> strict canonical limbs, value < p.

    x: (..., n) int32 (limbs minor, the LimbContext layout).
    """
    import jax.numpy as jnp

    n = ctx.n
    bias_np, e_np = _canon_consts(n)
    bias = jnp.asarray(bias_np)
    e = jnp.asarray(e_np)

    def strict(v, passes):
        for _ in range(passes):
            v = ctx._carry_pass(v)
        return v

    x = strict(x, 3)  # limbs near [0, 2^12), value unchanged mod p
    x = x + bias      # value in (3p, 6p) > 0
    x = strict(x, n + 2)
    # two folds of bits >= 128: v = lo + hi * e  (2^128 == e mod p)
    for _ in range(2):
        hi = x[..., _TI] >> _TOFF  # (...,) value of bits >= 128 (< 2^8)
        lo_top = x[..., _TI] & ((1 << _TOFF) - 1)
        x = jnp.concatenate(
            [x[..., :_TI], lo_top[..., None], jnp.zeros_like(x[..., _TI + 1 :])],
            axis=-1,
        )
        x = x + hi[..., None] * e
        # full cascade: adding e at the low limbs can ripple through a run
        # of 0xFFF limbs (p itself has ~7 of them), one limb per pass
        x = strict(x, n + 1)
    # conditional subtract: v >= p iff (v + e) has bit 128 set
    w = strict(x + e, n + 1)
    ge = (w[..., _TI] >> _TOFF) > 0
    w_lo = jnp.concatenate(
        [
            w[..., :_TI],
            (w[..., _TI] & ((1 << _TOFF) - 1))[..., None],
            jnp.zeros_like(w[..., _TI + 1 :]),
        ],
        axis=-1,
    )
    return jnp.where(ge[..., None], w_lo, x)


def limbs_to_u32_words(x, nbytes: int = 16):
    """Strict 12-bit limbs (..., n) -> (..., nbytes//4) uint32 LE words."""
    import jax.numpy as jnp

    n = x.shape[-1]
    words = []
    for w in range(nbytes // 4):
        lo_bit = 32 * w
        acc = None
        i = lo_bit // LIMB_BITS
        while i < n and LIMB_BITS * i < lo_bit + 32:
            shift = LIMB_BITS * i - lo_bit  # limb position within the word
            piece = x[..., i] >> (-shift) if shift < 0 else x[..., i] << shift
            acc = piece if acc is None else acc | piece
            i += 1
        words.append(acc.astype(jnp.uint32) & jnp.uint32(0xFFFFFFFF))
    return jnp.stack(words, axis=-1)


# ---------------------------------------------------------------------------
# fused batch program
# ---------------------------------------------------------------------------


@backend_cached
def _lde_commit_jitted(_backend, p: int, n: int, blowup: int, offset: int):
    """(B, n, limbs) canonical traces -> (coeffs, lde, lde_words, leaf_cvs).

    coeffs/lde: relaxed limb arrays (as _coset_lde_jitted); lde_words:
    (B, N, 4) uint32 canonical LE words (the hash messages, also the cheap
    host decode); leaf_cvs: (B*N, 8) uint32 BLAKE3-256 leaf digests.
    """
    import jax
    import jax.numpy as jnp

    from .blake3_device import _STANDALONE, IV, _compress_vec
    from .limb import _int_to_limbs as i2l
    from .ntt import ntt_device

    ctx = get_context(p)
    off_pows = np.stack(
        [i2l(pow(offset, i, p) * ctx.R % p, ctx.n) for i in range(n)]
    )

    def run(x_canonical: jnp.ndarray):  # (B, n, limbs)
        B = x_canonical.shape[0]
        xm = ctx.to_mont(x_canonical)
        coeffs_m = ntt_device(ctx, xm, invert=True)
        shifted = ctx.mont_mul(coeffs_m, jnp.asarray(off_pows))
        padded = jnp.pad(shifted, ((0, 0), (0, n * (blowup - 1)), (0, 0)))
        lde_m = ntt_device(ctx, padded, invert=False)
        coeffs = ctx.from_mont(coeffs_m)
        lde = ctx.from_mont(lde_m)  # (B, N, limbs) relaxed
        canon = canon_f128_device(ctx, lde)
        words = limbs_to_u32_words(canon, 16)  # (B, N, 4)
        N = n * blowup
        m = jnp.zeros((B * N, 16), dtype=jnp.uint32)
        m = m.at[:, :4].set(words.reshape(B * N, 4))
        iv = jnp.broadcast_to(jnp.asarray(IV, dtype=jnp.uint32), (B * N, 8))
        cvs = _compress_vec(iv, m, 0, 16, _STANDALONE)  # (B*N, 8)
        return coeffs, lde, words, cvs

    from .blake3_device import _use_jit

    # XLA:CPU compiles the unrolled compress graph pathologically (same gate
    # as blake3_device); accelerators jit the whole fused program.
    return jax.jit(run) if _use_jit() else run


def coset_lde_commit_batch(p: int, traces, blowup: int, offset: int):
    """Batch LDE + leaf-digest commit, one device dispatch.

    Returns (polys, ldes, leaf_digest_rows): ``polys``/``ldes`` as int lists
    (like :func:`libzkp_tpu.ops.ntt.coset_lde_batch`), ``leaf_digest_rows``
    a list of per-proof lists of 32-byte leaf digests (feed MerkleTree).
    """
    ctx = get_context(p)
    B = len(traces)
    n = len(traces[0])
    padded_b = max(16, 1 << (B - 1).bit_length())
    flat = [v for t in traces for v in t] + [0] * (n * (padded_b - B))
    x = ctx.encode(flat).reshape(padded_b, n, ctx.n)
    coeffs, lde, words, cvs = _lde_commit_jitted(p, n, blowup, offset)(x)
    N = n * blowup
    words_np = np.asarray(words)[:B]  # (B, N, 4) uint32
    cvs_np = np.asarray(cvs).reshape(padded_b, N, 8)[:B]
    # decode LDE ints from canonical words (exact, no limb decode needed)
    w64 = words_np.astype(np.uint64)
    lo = w64[..., 0] | (w64[..., 1] << 32)
    hi = w64[..., 2] | (w64[..., 3] << 32)
    polys = ctx.decode(coeffs)
    polys = [polys[i * n : (i + 1) * n] for i in range(B)]
    ldes = [
        [int(lo[b, r]) | (int(hi[b, r]) << 64) for r in range(N)]
        for b in range(B)
    ]
    leaf_rows = [
        [cvs_np[b, r].astype("<u4").tobytes() for r in range(N)]
        for b in range(B)
    ]
    return polys, ldes, leaf_rows
