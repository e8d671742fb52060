"""Fold-reduction limb field arithmetic for Pallas/TPU curve kernels.

Unlike :mod:`libzkp_tpu.ops.limb` (Montgomery REDC, limbs on the last axis),
this engine targets the device *point-arithmetic* kernels:

* **Plain representation** (no Montgomery domain): a value is its relaxed
  signed 12-bit limbs, shape ``(..., n, L)`` — limbs on the second-to-last
  (sublane) axis, batch elements on the last (lane) axis.
* **Fold reduction**: the double-width schoolbook product T (2n+2 columns) is
  carried twice (no-wrap) and the high columns are folded back with the
  constant matrix ``FOLD[i] = limbs(2^(12(n+i)) mod p)`` — a fully parallel
  multiply-accumulate with **no sequential REDC chain**, the key property for
  VPU throughput inside Pallas kernels.
* Bounds (n = 22, relaxed |limb| <= ~2^13.1): conv columns < 2^31, fold
  accumulator < 2^29, three wrap carries restore the relaxed invariant
  (the top limb of 2^(12n) mod p is tiny for p < 2^(12n-8), keeping wrap
  contributions small). Verified by the differential tests.

All ops are pure jnp functions of values, usable unchanged inside Pallas
kernels and in plain jitted XLA. Constants are *passed in* (Pallas forbids
captured array constants); :meth:`FoldCtx.consts_block` packs them as rows of
one int32 matrix.

Replaces the field cores consumed by the reference from curve25519-dalek and
ark-ff (``/root/reference/src/backend/bulletproofs.rs:4-5``, ``snark.rs:4-5``)
on the device tier.
"""

from __future__ import annotations

import functools
from typing import List, Sequence

import numpy as np

LIMB_BITS = 12
LIMB_MASK = (1 << LIMB_BITS) - 1


def int_to_limbs(x: int, n: int) -> np.ndarray:
    out = np.zeros(n, dtype=np.int32)
    for i in range(n):
        out[i] = x & LIMB_MASK
        x >>= LIMB_BITS
    assert x == 0, "value does not fit in limb count"
    return out


def limbs_to_int(limbs) -> int:
    x = 0
    for i, v in enumerate(np.asarray(limbs, dtype=np.int64).tolist()):
        x += int(v) << (LIMB_BITS * i)
    return x


class FoldCtx:
    """Per-prime constants for the fold field (host side, numpy only)."""

    def __init__(self, p: int):
        self.p = p
        # >= 9 bits of slack above p so chained relaxed values stay bounded;
        # rounded up to a multiple of 8 so the (n, B) limb blocks tile the
        # (8, 128) VPU registers exactly — coordinate slices and the
        # (C*n, B) -> (C, n, B) reshapes in the MSM gather kernels are then
        # sublane-aligned (22-row blocks padded to 24 cost the same VPU time
        # but force shifted relayouts on every slice boundary).
        n_min = (p.bit_length() + 9 + LIMB_BITS - 1) // LIMB_BITS
        self.n = (n_min + 7) // 8 * 8
        n = self.n
        assert (1 << (LIMB_BITS * n)) >> 8 >= p, "insufficient limb slack"
        self.ONE = int_to_limbs((1 << (LIMB_BITS * n)) % p, n)  # wrap constant
        self.FOLD = np.stack(
            [int_to_limbs((1 << (LIMB_BITS * (n + i))) % p, n) for i in range(n + 2)]
        )

    # -- constant packing for kernels ---------------------------------------
    def consts_block(self, extra: Sequence[np.ndarray] = ()) -> np.ndarray:
        """Rows: [ONE, FOLD (n+2 rows), *extra] — shape (n+3+len(extra), n)."""
        rows = [self.ONE[None, :], self.FOLD]
        for e in extra:
            rows.append(np.asarray(e, dtype=np.int32)[None, :])
        return np.concatenate(rows, axis=0).astype(np.int32)

    def encode_value(self, v: int) -> np.ndarray:
        return int_to_limbs(int(v) % self.p, self.n)

    def encode_ints(self, vals: Sequence[int]) -> np.ndarray:
        """(B, n) canonical int32 limbs."""
        return np.stack([int_to_limbs(int(v) % self.p, self.n) for v in vals])

    def decode(self, arr) -> List[int]:
        """(..., n) relaxed limbs (host numpy) -> canonical ints mod p.

        Vectorized via :func:`libzkp_tpu.ops.limb.limb_rows_to_ints` (~20x
        faster than per-limb Python accumulation at MSM batch sizes)."""
        from .limb import limb_rows_to_ints

        a = np.asarray(arr, dtype=np.int64)
        return limb_rows_to_ints(a.reshape(-1, self.n), self.p)


@functools.lru_cache(maxsize=None)
def get_fold_ctx(p: int) -> FoldCtx:
    return FoldCtx(p)


# Context flag: code paths that run a jitted program over an explicit CPU
# device mesh (the multichip dryrun, virtual-mesh tests) while the process's
# DEFAULT backend is an accelerator set this so kernel factories build their
# interpret/jnp variants. Consulted by curve_jax._interpret() and included
# in every backend_cached key.
FORCE_INTERPRET = [False]


class force_interpret:
    """with force_interpret(): build/run kernels in CPU-interpret mode."""

    def __enter__(self):
        self._old = FORCE_INTERPRET[0]
        FORCE_INTERPRET[0] = True

    def __exit__(self, *exc):
        FORCE_INTERPRET[0] = self._old


def backend_cached(fn):
    """lru_cache keyed ALSO on the active jax backend.

    The kernel factories bake the interpret-vs-compiled decision (and
    backend-sensitive lowering choices) into the built callable at cache
    time; a process that touches the TPU backend and then switches to the
    virtual CPU mesh (the multichip dryrun, mixed test setups) must not be
    served the other backend's build.
    """
    cached = functools.lru_cache(maxsize=None)(fn)

    @functools.wraps(fn)
    def wrapper(*args):
        import jax

        try:
            backend = jax.default_backend()
        except Exception:
            backend = "cpu"
        if FORCE_INTERPRET[0]:
            backend = "cpu"
        return cached(backend, *args)

    wrapper.cache_clear = cached.cache_clear  # type: ignore[attr-defined]
    return wrapper


@functools.lru_cache(maxsize=None)
def _eager_mul(n: int):
    import jax

    def run(a, b, one_row, fold_rows):
        consts = jax.numpy.concatenate([one_row[:, 0][None, :], fold_rows], axis=0)
        return FieldOps(n, consts)._mul_impl(a, b)

    return jax.jit(run)


class FieldOps:
    """Value-level field ops on (..., n, L) int32 arrays.

    Built from a consts block *inside* a kernel/trace (constants become VMEM
    loads in Pallas, XLA constants in plain jit). ``one_l`` is (n, 1),
    ``fold_c`` is (n+2, n).
    """

    def __init__(self, n: int, consts):
        self.n = n
        self.one_l = consts[0][:, None]
        self.fold_c = consts[1 : n + 3]
        self._extra = consts[n + 3 :]

    def extra_const(self, idx: int):
        """Extra constant row idx as (n, 1), broadcastable."""
        return self._extra[idx][:, None]

    # -- carries -------------------------------------------------------------
    def carry(self, x):
        """One wrap-carry pass; preserves value mod p, relaxes limbs."""
        import jax.numpy as jnp

        lo = x & LIMB_MASK
        hi = x >> LIMB_BITS
        pad = [(0, 0)] * (x.ndim - 2) + [(1, 0), (0, 0)]
        return lo + jnp.pad(hi[..., :-1, :], pad) + hi[..., -1:, :] * self.one_l

    def _carry_nw(self, x):
        """No-wrap pass over a wide (column) array; top carry must be absorbed
        by a spare top column (callers allocate 2n+2 columns)."""
        import jax.numpy as jnp

        lo = x & LIMB_MASK
        hi = x >> LIMB_BITS
        pad = [(0, 0)] * (x.ndim - 2) + [(1, 0), (0, 0)]
        return lo + jnp.pad(hi[..., :-1, :], pad)

    # -- ring ops --------------------------------------------------------------
    def add(self, a, b):
        return self.carry(a + b)

    def sub(self, a, b):
        return self.carry(a - b)

    def smul(self, a, k: int):
        """Multiply by small plain int (|k| <= ~2^16); two carry passes."""
        import jax.numpy as jnp

        return self.carry(self.carry(a * jnp.int32(k)))

    def _mul_impl(self, a, b):
        """Full product, conv -> 2 no-wrap carries -> fold -> 3 wrap carries."""
        import jax.numpy as jnp

        n = self.n
        NC = 2 * n + 2
        nb = a.ndim - 2
        T = sum(
            jnp.pad(
                a * b[..., j : j + 1, :],
                [(0, 0)] * nb + [(j, NC - n - j), (0, 0)],
            )
            for j in range(n)
        )
        T = self._carry_nw(self._carry_nw(T))
        acc = T[..., :n, :]
        for i in range(n + 2):
            acc = acc + T[..., n + i : n + i + 1, :] * self.fold_c[i][:, None]
        return self.carry(self.carry(self.carry(acc)))

    def mul(self, a, b):
        import jax

        if isinstance(a, jax.core.Tracer) or isinstance(b, jax.core.Tracer):
            return self._mul_impl(a, b)
        # eager (CPU/test) path: one jitted dispatch instead of ~100 eager ops
        return _eager_mul(self.n)(a, b, self.one_l, self.fold_c)

    def square(self, a):
        return self.mul(a, a)
