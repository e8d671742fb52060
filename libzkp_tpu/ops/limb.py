"""Limb-decomposed big-integer modular arithmetic for TPU (JAX).

Design (TPU-first, see SURVEY.md §7 step 1):

* Field elements are arrays of ``n`` 16-bit limbs stored in ``uint32`` lanes,
  shape ``(..., n)``, least-significant limb first.
* Multiplication is schoolbook column accumulation + Montgomery REDC (CIOS
  with 16-bit words). All intermediates fit in uint32 — products of 16-bit
  limbs are < 2^32 and column sums stay < 2^24 — so the kernels run natively
  on the TPU VPU with **no 64-bit emulation** and no x64 mode.
* Everything is shape-polymorphic over leading batch dims; ``vmap``/``pjit``
  shard the batch axis across the mesh (the DP axis that replaces the
  reference's rayon pool, SURVEY.md §2.3).

This replaces the external Rust crates' field cores (curve25519-dalek /
ark-ff / winterfell f128) with one parameterized engine instantiated per
modulus (reference consumption sites: bulletproofs.rs:4-5, snark.rs:4-5,
stark.rs:707-718).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

LIMB_BITS = 16
LIMB_MASK = (1 << LIMB_BITS) - 1


def _int_to_limbs(x: int, n: int) -> np.ndarray:
    out = np.zeros(n, dtype=np.uint32)
    for i in range(n):
        out[i] = x & LIMB_MASK
        x >>= LIMB_BITS
    assert x == 0, "value does not fit in limb count"
    return out


def _limbs_to_int(limbs) -> int:
    x = 0
    for i, v in enumerate(np.asarray(limbs, dtype=np.uint64).tolist()):
        x |= int(v) << (LIMB_BITS * i)
    return x


class LimbContext:
    """Montgomery arithmetic mod ``p`` on 16-bit-limb uint32 arrays.

    Elements passed to :meth:`mont_mul`/:meth:`add`/:meth:`sub` must be
    normalized (each limb < 2^16) and canonical (< p). ``mont_*`` methods work
    in the Montgomery domain (x·R mod p, R = 2^(16n)).
    """

    def __init__(self, p: int, name: str = ""):
        self.p = p
        self.name = name
        self.n = (p.bit_length() + LIMB_BITS - 1) // LIMB_BITS
        n = self.n
        self.p_limbs = jnp.asarray(_int_to_limbs(p, n))
        self.p_limbs_np = _int_to_limbs(p, n)
        # -p^{-1} mod 2^16 (Montgomery constant for 16-bit words)
        self.ninv = (-pow(p, -1, 1 << LIMB_BITS)) % (1 << LIMB_BITS)
        self.R = pow(2, LIMB_BITS * n, p)
        self.R2 = self.R * self.R % p
        self.r2_limbs = jnp.asarray(_int_to_limbs(self.R2, n))
        self.one_mont = jnp.asarray(_int_to_limbs(self.R % p, n))
        self.zero = jnp.zeros(n, dtype=jnp.uint32)

    # -- host <-> device codecs -------------------------------------------
    def encode(self, values) -> jnp.ndarray:
        """List/array of Python ints -> (B, n) canonical limb array."""
        arr = np.stack([_int_to_limbs(int(v) % self.p, self.n) for v in values])
        return jnp.asarray(arr)

    def encode_scalar(self, value: int) -> jnp.ndarray:
        return jnp.asarray(_int_to_limbs(int(value) % self.p, self.n))

    def decode(self, arr) -> list:
        a = np.asarray(jax.device_get(arr), dtype=np.uint32)
        if a.ndim == 1:
            return [_limbs_to_int(a)]
        flat = a.reshape(-1, self.n)
        return [_limbs_to_int(row) for row in flat]

    # -- normalization helpers --------------------------------------------
    def _normalize(self, cols: jnp.ndarray, out_limbs: int) -> jnp.ndarray:
        """Carry-propagate uint32 column sums into 16-bit limbs (exact).

        ``cols`` has shape (..., m); returns (..., out_limbs). Any overflow
        beyond out_limbs is dropped (callers guarantee it is zero).
        """
        m = cols.shape[-1]
        x = jnp.moveaxis(cols, -1, 0)  # (m, ...)

        def step(carry, col):
            s = col + carry
            return s >> LIMB_BITS, s & LIMB_MASK

        carry0 = jnp.zeros(x.shape[1:], dtype=jnp.uint32)
        final_carry, limbs = jax.lax.scan(step, carry0, x)
        limbs = jnp.moveaxis(limbs, 0, -1)  # (..., m)
        if m < out_limbs:
            # Final carry (< 2^16 since columns < 2^32) lands in limb m.
            pad = [(0, 0)] * (limbs.ndim - 1) + [(0, out_limbs - m)]
            limbs = jnp.pad(limbs, pad)
            limbs = limbs.at[..., m].set(final_carry & LIMB_MASK)
        else:
            limbs = limbs[..., :out_limbs]
        return limbs

    def _reduce_once(self, s: jnp.ndarray) -> jnp.ndarray:
        """Canonicalize a normalized (..., n+1)-limb value known to be < 2p.

        If the value >= p (top limb set, or low limbs >= p) subtract p; the
        wrapping subtract is exact because the true result is < p < 2^(16n).
        """
        top = s[..., self.n]
        s_lo = s[..., : self.n]
        d = self._sub_raw(s_lo, self.p_limbs)
        ge = jnp.logical_or(top > 0, self._geq(s_lo, self.p_limbs))
        return jnp.where(ge[..., None], d, s_lo)

    # -- ring ops ----------------------------------------------------------
    def add(self, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
        return self._reduce_once(self._normalize(a + b, self.n + 1))

    def _sub_raw(self, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
        """(a - b) mod 2^(16n) — used when the true difference is known >= 0
        or when a borrow is intentionally wrapped (a + 2^(16n) - b)."""
        ai = jnp.moveaxis(a, -1, 0).astype(jnp.int32)
        bi = jnp.moveaxis(jnp.broadcast_to(b, a.shape), -1, 0).astype(jnp.int32)

        def step(borrow, inputs):
            av, bv = inputs
            d = av - bv - borrow
            bo = (d < 0).astype(jnp.int32)
            return bo, d + (bo << LIMB_BITS)

        borrow0 = jnp.zeros(ai.shape[1:], dtype=jnp.int32)
        _, diff = jax.lax.scan(step, borrow0, (ai, bi))
        return jnp.moveaxis(diff, 0, -1).astype(jnp.uint32)

    def _geq(self, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
        """a >= b, limbwise lexicographic from the top."""
        bb = jnp.broadcast_to(b, a.shape)
        gt = a > bb
        lt = a < bb
        # most-significant differing limb decides
        result = jnp.zeros(a.shape[:-1], dtype=jnp.bool_)
        decided = jnp.zeros(a.shape[:-1], dtype=jnp.bool_)
        for i in range(self.n - 1, -1, -1):
            result = jnp.where(~decided & gt[..., i], True, result)
            decided = decided | gt[..., i] | lt[..., i]
        return result | ~decided  # equal -> geq

    def sub(self, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
        """(a - b) mod p for canonical a, b."""
        need_p = ~self._geq(a, b)
        a_adj_cols = a + jnp.where(need_p[..., None], self.p_limbs, 0)
        a_adj = self._normalize(a_adj_cols, self.n + 1)[..., : self.n]
        # a_adj < 2p and a_adj >= b, so raw subtract is exact; result < p? a<p, so
        # a+p-b < 2p but >= p only if a >= b... a<b case: a+p-b < p ✓.
        # a>=b case: a-b < p ✓.
        return self._sub_raw(a_adj, jnp.broadcast_to(b, a.shape))

    def neg(self, a: jnp.ndarray) -> jnp.ndarray:
        is_zero = jnp.all(a == 0, axis=-1, keepdims=True)
        d = self._sub_raw(jnp.broadcast_to(self.p_limbs, a.shape), a)
        return jnp.where(is_zero, a, d)

    def mont_mul(self, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
        """Montgomery product: a·b·R^{-1} mod p. Inputs canonical limbs."""
        n = self.n
        a, b = jnp.broadcast_arrays(a, b)
        batch_shape = a.shape[:-1]
        # Column accumulation: T[k] = sum_{i+j=k} lo(a_i b_j) + sum hi shifted.
        T = jnp.zeros(batch_shape + (2 * n + 1,), dtype=jnp.uint32)
        for j in range(n):
            pj = a * b[..., j : j + 1]  # (..., n) uint32 products
            T = T.at[..., j : j + n].add(pj & LIMB_MASK)
            T = T.at[..., j + 1 : j + n + 1].add(pj >> LIMB_BITS)
        # Interleaved REDC: zero out the low n limbs.
        ninv = jnp.uint32(self.ninv)
        for i in range(n):
            m = ((T[..., i] & LIMB_MASK) * ninv) & LIMB_MASK
            mp = m[..., None] * self.p_limbs  # (..., n) < 2^32
            T = T.at[..., i : i + n].add(mp & LIMB_MASK)
            T = T.at[..., i + 1 : i + n + 1].add(mp >> LIMB_BITS)
            T = T.at[..., i + 1].add(T[..., i] >> LIMB_BITS)
        res = self._normalize(T[..., n : 2 * n + 1], self.n + 1)
        return self._reduce_once(res)

    def mont_square(self, a: jnp.ndarray) -> jnp.ndarray:
        return self.mont_mul(a, a)

    def to_mont(self, a: jnp.ndarray) -> jnp.ndarray:
        return self.mont_mul(a, self.r2_limbs)

    def from_mont(self, a: jnp.ndarray) -> jnp.ndarray:
        one = jnp.zeros_like(a).at[..., 0].set(1)
        return self.mont_mul(a, one)

    # -- derived ops -------------------------------------------------------
    def mont_pow5(self, a: jnp.ndarray) -> jnp.ndarray:
        a2 = self.mont_mul(a, a)
        a4 = self.mont_mul(a2, a2)
        return self.mont_mul(a4, a)


@functools.lru_cache(maxsize=None)
def get_context(p: int, name: str = "") -> LimbContext:
    return LimbContext(p, name)
