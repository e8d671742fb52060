"""Device scalar arithmetic mod l (the Ristretto group order) for the
whole-pipeline on-device bulletproofs prover.

Provides, over (…, n, B) fold-limb arrays (:mod:`libzkp_tpu.ops.limbfold`):

* ring ops (via the generic ``FieldOps``),
* Fermat inversion x^(l-2),
* reduction of 64-byte transcript challenges,
* the scalar -> radix-256 digit-window pipeline feeding the MSM driver —
  WITHOUT canonicalization: the MSM consumes any 256-bit representative
  v ≡ s (mod l); since every basis point has order l, Σ d_i 2^(8i) · P
  only depends on v mod l.  Strict (non-negative, <2^12) limbs are enough,
  reached by one signed fold at 2^252 ≡ -δ, a +4l bias, and carry passes.

Replaces curve25519-dalek ``Scalar`` consumption on the device tier
(``/root/reference/src/backend/bulletproofs.rs:4-5``); host tier stays
``ops/ed25519.py``.
"""

from __future__ import annotations

import functools
from typing import List

import numpy as np

from .limbfold import LIMB_BITS, FieldOps, get_fold_ctx, int_to_limbs

# l = 2^252 + DELTA
DELTA = 27742317777372353535851937790883648493
L_ORDER = (1 << 252) + DELTA

_FOLD_LIMB = 252 // LIMB_BITS  # 21: limb index whose base is exactly 2^252


class ScalarDeviceCtx:
    """Host-side constant pack for the mod-l device engine."""

    def __init__(self):
        self.ctx = get_fold_ctx(L_ORDER)
        self.n = self.ctx.n  # 24 (8-aligned)
        assert _FOLD_LIMB * LIMB_BITS == 252 and _FOLD_LIMB < self.n
        self.delta_limbs = int_to_limbs(DELTA, self.n)
        self.bias_limbs = int_to_limbs(4 * L_ORDER, self.n)
        self.c256_limbs = int_to_limbs(pow(2, 256, L_ORDER), self.n)
        # NOTE (round 5): a floors-redistributed bias (to replace the n+2
        # borrow-cascade passes below with ~3 positive-only passes) is
        # STRUCTURALLY IMPOSSIBLE for l: every small multiple c*l is
        # 2^252-dominated with zero limbs in rows 11..20, and moving one
        # row-16 unit down exceeds rows 0..15's total digit capacity by
        # exactly 1 — so any floor at the delta-fold rows forces a 4095-run
        # that single carry passes ripple through one row per pass. Caught
        # by tests/test_scalar_device.py::test_digit_windows_adversarial_values.
        # consts block rows: [ONE, FOLD(n+2), delta, bias, c256]
        self.consts_np = self.ctx.consts_block(
            [self.delta_limbs, self.bias_limbs, self.c256_limbs]
        )

    def field(self, consts) -> FieldOps:
        return FieldOps(self.n, consts)

    # extra const row indices (after ONE + FOLD rows)
    IDX_DELTA = 0
    IDX_BIAS = 1
    IDX_C256 = 2

    # -- host codecs -------------------------------------------------------
    def encode(self, vals) -> np.ndarray:
        """ints -> (len, n) canonical limbs (host)."""
        return self.ctx.encode_ints([v % L_ORDER for v in vals])

    def decode(self, arr) -> List[int]:
        return [v % L_ORDER for v in self.ctx.decode(arr)]


@functools.lru_cache(maxsize=None)
def get_scalar_ctx() -> ScalarDeviceCtx:
    return ScalarDeviceCtx()


# ---------------------------------------------------------------------------
# traced ops (usable in plain jit and inside Pallas kernels)
# ---------------------------------------------------------------------------


def fold252(f: FieldOps, sc: ScalarDeviceCtx, x):
    """One signed fold: value -> value - (x>>252)*(2^252 + delta) + ... i.e.
    replaces the 2^252-and-up part via 2^252 ≡ -delta (mod l).

    Input limbs relaxed; output limbs relaxed, |value| < max(2^138, low part).
    """
    import jax.numpy as jnp

    hi = x[..., _FOLD_LIMB:, :]  # (n-21, B): limbs 21 = 2^252 units
    lo = jnp.concatenate(
        [x[..., :_FOLD_LIMB, :], jnp.zeros_like(hi)], axis=-2
    )
    delta = f.extra_const(ScalarDeviceCtx.IDX_DELTA)  # (n, 1)
    # value of hi part: sum_j hi_j * 2^(12j) * 2^252 == -(sum hi_j 2^(12j)) * delta
    # hi has n-21=1 row for n=22
    acc = lo
    for j in range(x.shape[-2] - _FOLD_LIMB):
        acc = acc - hi[..., j : j + 1, :] * _shift_rows(delta, j)
    return f.carry(f.carry(acc))


def _shift_rows(col, j: int):
    """delta * 2^(12 j) as a limb column: shift rows down by j (drop top)."""
    import jax.numpy as jnp

    if j == 0:
        return col
    pad = [(j, 0), (0, 0)]
    return jnp.pad(col[:-j, :], pad)


def strict_digit_windows(f: FieldOps, sc: ScalarDeviceCtx, x):
    """Relaxed mod-l limbs (..., n, B) -> radix-256 digit windows.

    Returns (32, ..., B) int32 digit rows, HIGH window first, representing a
    non-negative value < 2^256 congruent to x mod l (not canonical — see
    module docstring).
    """
    import jax.numpy as jnp

    n = sc.n
    x = f.carry(f.carry(f.carry(x)))
    x = fold252(f, sc, x)          # |value| < 2^252 + 2^138
    x = fold252(f, sc, x)          # value in (-2^138, 2^252)
    x = x + f.extra_const(ScalarDeviceCtx.IDX_BIAS)  # + 4l: (0, 2^254.4)
    # strict normalization: value >= 0 ==> <= n+2 passes settle all borrows
    for _ in range(n + 2):
        x = f.carry(x)
    # x: strict limbs in [0, 2^12); bits 256.. are zero by the value bound.
    # repack 12-bit limbs -> 8-bit bytes (LE), static shifts
    bytes_rows = []
    for j in range(32):
        bit = 8 * j
        i, off = bit // LIMB_BITS, bit % LIMB_BITS
        b = x[..., i, :] >> off
        take = LIMB_BITS - off
        if take < 8 and i + 1 < n:
            b = b | (x[..., i + 1, :] << take)
        bytes_rows.append(b & 0xFF)
    return jnp.stack(bytes_rows[::-1], axis=0)  # high window first


def inv_device(f: FieldOps, x):
    """x^(l-2) — Fermat inversion mod l, 4-bit fixed windows.

    The exponent is constant, so square-and-multiply runs as a lax.scan over
    its 4-bit windows: 15 precomputed odd/even powers, then 63 iterations of
    (4 squares + one gathered multiply). Versus the bit-serial scan (253
    iterations) the sequential dependency chain is 4x shorter — these
    (n, B) muls are latency-bound on the device, so chain length is wall
    time. HLO stays small (the ladder body is rolled).
    """
    import jax
    import jax.numpy as jnp

    e = L_ORDER - 2
    W = 4
    nwin = (e.bit_length() + W - 1) // W  # 64 windows, top window first
    digs = [(e >> (W * (nwin - 1 - i))) & ((1 << W) - 1) for i in range(nwin)]
    # powers[d] = x^d for d in 0..15 (powers[0] = 1)
    one = jnp.zeros_like(x).at[..., 0, :].set(1)
    pows = [one, x]
    for d in range(2, 1 << W):
        pows.append(f._mul_impl(pows[-1], x))
    table = jnp.stack(pows, axis=0)  # (16, n, B)
    digits = jnp.asarray(np.array(digs[1:], np.int32))

    def step(acc, d):
        for _ in range(W):
            acc = f._mul_impl(acc, acc)
        acc = f._mul_impl(acc, table[d])
        return acc, None

    acc, _ = jax.lax.scan(step, table[digs[0]], digits)
    return acc


def reduce_wide(f: FieldOps, sc: ScalarDeviceCtx, byte_rows):
    """(64, B) uint32 transcript bytes (LE) -> relaxed mod-l limbs (n, B).

    v = lo(32 bytes) + hi(32 bytes) * (2^256 mod l).
    """
    import jax.numpy as jnp

    n = sc.n

    def pack(rows):  # 32 byte rows -> (n, B) limbs
        limbs = []
        for i in range(n):
            bit = LIMB_BITS * i
            j, off = bit // 8, bit % 8
            if j >= 32:
                limbs.append(jnp.zeros_like(rows[0]).astype(jnp.int32))
                continue
            v = rows[j].astype(jnp.int32) >> off
            got = 8 - off
            jj = j + 1
            while got < LIMB_BITS and jj < 32:
                v = v | (rows[jj].astype(jnp.int32) << got)
                got += 8
                jj += 1
            limbs.append(v & ((1 << LIMB_BITS) - 1))
        return jnp.stack(limbs, axis=0)

    lo = pack([byte_rows[i] for i in range(32)])
    hi = pack([byte_rows[32 + i] for i in range(32)])
    c256 = f.extra_const(ScalarDeviceCtx.IDX_C256)
    return f.add(lo, f.mul(hi, jnp.broadcast_to(c256, hi.shape)))
