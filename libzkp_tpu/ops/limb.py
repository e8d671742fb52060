"""Limb-decomposed big-integer modular arithmetic for TPU (JAX).

Design (TPU-first, SURVEY.md §7 step 1):

* Field elements are arrays of ``n`` 12-bit limbs in **signed int32** lanes,
  shape ``(..., n)``, least-significant limb first.
* **Relaxed signed representation**: limbs stay in (-2^13, 2^13) and values in
  (-Cp, Cp) for a small C between operations. No sequential carry scans, no
  conditional subtracts, no borrow handling anywhere on the hot path — the
  three things that serialize big-int math on vector hardware. Subtraction is
  literally ``a - b``. Exact canonicalization happens only at the host
  boundary (:meth:`LimbContext.decode` reduces mod p).
* Multiplication: schoolbook column accumulation + Montgomery REDC with
  12-bit words. Bounds: |conv columns| <= n*2^26 < 2^30.5 (n <= 22), REDC
  adds <= n*2^24, carries < 2^19 — every intermediate fits int32, so the
  kernels run natively on any TPU generation (no 64-bit emulation).
* Batch axes shard over the mesh ``dp`` axis (the rayon replacement,
  SURVEY.md §2.3).

Replaces the field cores of curve25519-dalek / ark-ff / winterfell f128
(reference consumption: bulletproofs.rs:4-5, snark.rs:4-5, stark.rs:4-12).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

LIMB_BITS = 12
LIMB_MASK = (1 << LIMB_BITS) - 1


def _int_to_limbs(x: int, n: int) -> np.ndarray:
    out = np.zeros(n, dtype=np.int32)
    for i in range(n):
        out[i] = x & LIMB_MASK
        x >>= LIMB_BITS
    assert x == 0, "value does not fit in limb count"
    return out


def _limbs_to_int(limbs) -> int:
    x = 0
    for i, v in enumerate(np.asarray(limbs, dtype=np.int64).tolist()):
        x += int(v) << (LIMB_BITS * i)
    return x


def limb_rows_to_ints(flat: np.ndarray, p: int) -> list:
    """(rows, n) relaxed signed 12-bit limbs -> canonical ints mod p.

    Vectorized: limbs pair into 24-bit words, a numpy carry chain (over the
    word axis, not rows) makes every low word a clean 3-byte group, then each
    value is one ``int.from_bytes`` + one ``% p``.
    """
    rows = flat.shape[0]
    if rows == 0:
        return []
    if flat.shape[1] % 2:
        flat = np.pad(flat, ((0, 0), (0, 1)))
    w = flat[:, 0::2] + (flat[:, 1::2] << LIMB_BITS)  # (rows, nw) signed words
    nw = w.shape[1]
    for k in range(nw - 1):  # carry left->right; >> handles negatives
        w[:, k + 1] += w[:, k] >> 24
        w[:, k] &= 0xFFFFFF
    tops = w[:, nw - 1]
    stride = (nw - 1) * 3
    low = w[:, : nw - 1].astype(np.uint32)
    b = np.empty((rows, stride), dtype=np.uint8)
    b[:, 0::3] = low & 0xFF
    b[:, 1::3] = (low >> 8) & 0xFF
    b[:, 2::3] = (low >> 16) & 0xFF
    buf = b.tobytes()
    shift = 24 * (nw - 1)
    return [
        (int.from_bytes(buf[i * stride : (i + 1) * stride], "little")
         + (int(tops[i]) << shift)) % p
        for i in range(rows)
    ]


class LimbContext:
    """Montgomery arithmetic mod ``p`` on 12-bit signed-limb int32 arrays.

    Invariants between ops: limbs in (-2^13, 2^13); |value| < ~8p (callers
    chaining many additions — e.g. NTT butterflies — re-reduce periodically
    with :meth:`reduce`). ``mont_*`` methods work in the Montgomery domain
    (x*R mod p, R = 2^(12n)).
    """

    def __init__(self, p: int, name: str = ""):
        self.p = p
        self.name = name
        # >= 4 bits of headroom above p for relaxed values
        self.n = (p.bit_length() + 4 + LIMB_BITS - 1) // LIMB_BITS
        n = self.n
        self.p_limbs = jnp.asarray(_int_to_limbs(p, n))
        self.ninv = (-pow(p, -1, 1 << LIMB_BITS)) % (1 << LIMB_BITS)
        self.R = pow(2, LIMB_BITS * n, p)
        self.R2 = self.R * self.R % p
        self.r2_limbs = jnp.asarray(_int_to_limbs(self.R2, n))
        self.one_mont = jnp.asarray(_int_to_limbs(self.R % p, n))
        self.zero = jnp.zeros(n, dtype=jnp.int32)

    # -- host <-> device codecs -------------------------------------------
    def encode(self, values) -> jnp.ndarray:
        """Python ints -> (B, n) canonical limb array."""
        arr = np.stack([_int_to_limbs(int(v) % self.p, self.n) for v in values])
        return jnp.asarray(arr)

    def encode_scalar(self, value: int) -> jnp.ndarray:
        return jnp.asarray(_int_to_limbs(int(value) % self.p, self.n))

    def decode(self, arr) -> list:
        """(…, n) relaxed limb array -> canonical Python ints (mod p)."""
        a = np.asarray(jax.device_get(arr), dtype=np.int64)
        return limb_rows_to_ints(a.reshape(-1, self.n), self.p)

    # -- carry handling (vectorized, value-preserving, no scans) -----------
    def _carry_pass(self, x: jnp.ndarray) -> jnp.ndarray:
        """One parallel carry fold: (x & mask) + (x >> 12 shifted up).

        Exact mod p for signed values: arithmetic shift = floor and ``& mask``
        is the non-negative residue; the carry out of the top limb (+-1 for
        relaxed negative values) wraps around as R = 2^(12n), folded back in
        as R mod p so the value mod p is preserved exactly.
        """
        lo = x & LIMB_MASK
        hi = x >> LIMB_BITS
        hi_shift = jnp.pad(hi[..., :-1], [(0, 0)] * (x.ndim - 1) + [(1, 0)])
        wrap = hi[..., -1:]  # units of 2^(12n) == R
        return lo + hi_shift + wrap * self.one_mont

    def _relax(self, x: jnp.ndarray) -> jnp.ndarray:
        """Columns |.| < 2^31 -> relaxed limbs in (-2^13, 2^13): 3 passes.

        Pass bounds: |limb| < 2^12 + 2^19 -> < 2^12 + 2^8 -> < 2^12 + 1.
        """
        return self._carry_pass(self._carry_pass(self._carry_pass(x)))

    # -- ring ops ------------------------------------------------------------
    def add(self, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
        """Value add. Limbs < 2^14 before the pass, relaxed after."""
        return self._carry_pass(a + b)

    def sub(self, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
        """Plain signed subtract — negatives are first-class here."""
        return self._carry_pass(a - b)

    def neg(self, a: jnp.ndarray) -> jnp.ndarray:
        return self._carry_pass(-a)

    def mont_mul(self, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
        """Montgomery product a*b*R^{-1} (relaxed signed in, relaxed out).

        Output value in (-p, 2p) for |inputs| < sqrt(p*R)/2 — every caller is
        orders of magnitude below that.

        Compile-friendly formulation: the schoolbook columns are shifted pads
        summed in one shot (no scatters) and the REDC sweep is a fori_loop of
        dynamic-slice updates, so the HLO stays small whatever n is — big
        unrolled scatter chains made XLA:CPU compilation pathological.
        """
        n = self.n
        a, b = jnp.broadcast_arrays(a, b)
        nb = a.ndim - 1
        ninv = jnp.int32(self.ninv)
        p_limbs = self.p_limbs

        # columns T_k = sum_{i+j=k} a_i b_j (pad-sum, no scatter)
        T = sum(
            jnp.pad(a * b[..., j : j + 1], [(0, 0)] * nb + [(j, n - j)])
            for j in range(n)
        )
        if jax.default_backend() == "cpu":
            # XLA:CPU compiles long unrolled update chains pathologically
            # slowly; a rolled fori_loop keeps the HLO tiny.
            def redc_step(i, T):
                ti = jax.lax.dynamic_slice_in_dim(T, i, 1, axis=-1)
                m = ((ti & LIMB_MASK) * ninv) & LIMB_MASK
                window = jax.lax.dynamic_slice_in_dim(T, i, n, axis=-1)
                window = window + m * p_limbs
                T = jax.lax.dynamic_update_slice_in_dim(T, window, i, axis=-1)
                carry = window[..., :1] >> LIMB_BITS
                nxt = jax.lax.dynamic_slice_in_dim(T, i + 1, 1, axis=-1) + carry
                return jax.lax.dynamic_update_slice_in_dim(T, nxt, i + 1, axis=-1)

            T = jax.lax.fori_loop(0, n, redc_step, T)
        else:
            # TPU: static unrolled scatter-updates fuse well; the
            # dynamic-slice loop is the slower path there.
            for i in range(n):
                m = ((T[..., i] & LIMB_MASK) * ninv) & LIMB_MASK
                T = T.at[..., i : i + n].add(m[..., None] * p_limbs)
                T = T.at[..., i + 1].add(T[..., i] >> LIMB_BITS)
        return self._relax(T[..., n : 2 * n])

    def mont_square(self, a: jnp.ndarray) -> jnp.ndarray:
        return self.mont_mul(a, a)

    def to_mont(self, a: jnp.ndarray) -> jnp.ndarray:
        return self.mont_mul(a, self.r2_limbs)

    def from_mont(self, a: jnp.ndarray) -> jnp.ndarray:
        one = jnp.zeros_like(a).at[..., 0].set(1)
        return self.mont_mul(a, one)

    def reduce(self, a: jnp.ndarray) -> jnp.ndarray:
        """Bring a (Montgomery-domain) value back into (-p, 2p): x * R * R^-1."""
        return self.mont_mul(a, self.one_mont)

    # -- derived ops ---------------------------------------------------------
    def mont_pow5(self, a: jnp.ndarray) -> jnp.ndarray:
        a2 = self.mont_mul(a, a)
        a4 = self.mont_mul(a2, a2)
        return self.mont_mul(a4, a)


@functools.lru_cache(maxsize=None)
def get_context(p: int, name: str = "") -> LimbContext:
    return LimbContext(p, name)
