"""Device curve engines + windowed MSM (Pallas kernels over the fold field).

The MSM engine of SURVEY.md §2.3, replacing the point math the reference
consumes from ``curve25519-dalek`` / ``ark-ec``
(``/root/reference/src/backend/bulletproofs.rs:138-158`` and the ark-groth16
query MSMs) with a TPU-first design:

* Points are ``(..., C, n, L)`` int32 arrays — coordinates × 12-bit fold-field
  limbs (:mod:`libzkp_tpu.ops.limbfold`) × batch lanes. **Complete** addition
  laws only (unified extended Edwards a=-1; Renes–Costello–Batina projective
  for a=0 Weierstrass, G1 over Fq and G2 over Fq2) — branch-free, XLA/Mosaic
  friendly.
* MSM = shared-multiples radix-256 windows: per basis point a 256-entry
  multiples table (built on device once per basis); scalar digits are the
  scalars' little-endian **bytes**. One ``lax.scan`` walks windows high→low:
  XLA gathers the digit multiples, a Pallas kernel tree-reduces over the
  basis axis (K in VMEM-sized chunks, accumulated across grid steps), and a
  second Pallas kernel Horner-folds (8 doublings + add). The whole MSM batch
  is ONE device dispatch — critical because the host↔device round trip costs
  ~25 ms on a tunneled TPU.
* Multi-chip: :func:`msm_many_sharded` shards the batch over the mesh ``dp``
  axis and the basis over ``shard`` with an all-gather + on-device fold
  (point addition is not a psum-reducible op).

Pallas kernels run in interpret mode on the CPU backend so the full test
suite (8-device virtual CPU mesh) exercises the identical code path.
Differential tests: tests/test_curve_jax.py vs ops/ed25519.py and ops/bn254.py.
"""

from __future__ import annotations

import functools
from typing import List, Sequence, Tuple

import numpy as np

from .limbfold import FieldOps, FoldCtx, backend_cached, get_fold_ctx

SCALAR_BYTES = 32
NWIN = SCALAR_BYTES
K_CHUNK = 32  # basis points tree-reduced per Pallas grid step
B_TILE = 256  # batch lanes per Pallas grid step


def _interpret() -> bool:
    import jax

    from .limbfold import FORCE_INTERPRET

    return FORCE_INTERPRET[0] or jax.default_backend() == "cpu"


# ---------------------------------------------------------------------------
# Field adapters for the generic Weierstrass formulas
# ---------------------------------------------------------------------------


class _Fq:
    """Base-field adapter: field elements are (..., 1, n, L) coordinate rows."""

    rows = 1

    def __init__(self, f: FieldOps):
        self.f = f

    def mul(self, a, b):
        return self.f.mul(a, b)

    def add(self, a, b):
        return self.f.add(a, b)

    def sub(self, a, b):
        return self.f.sub(a, b)

    def smul(self, a, k):
        return self.f.smul(a, k)


class _Fq2:
    """Fq2 = Fq[u]/(u^2+1) on (..., 2, n, L) arrays (BN254 G2)."""

    rows = 2

    def __init__(self, f: FieldOps):
        self.f = f

    def mul(self, a, b):
        import jax.numpy as jnp

        f = self.f
        a0, a1 = a[..., 0:1, :, :], a[..., 1:2, :, :]
        b0, b1 = b[..., 0:1, :, :], b[..., 1:2, :, :]
        m0 = f.mul(a0, b0)
        m1 = f.mul(a1, b1)
        t = f.mul(f.add(a0, a1), f.add(b0, b1))
        return jnp.concatenate([f.sub(m0, m1), f.sub(f.sub(t, m0), m1)], axis=-3)

    def add(self, a, b):
        return self.f.add(a, b)

    def sub(self, a, b):
        return self.f.sub(a, b)

    def smul(self, a, k):
        return self.f.smul(a, k)


# ---------------------------------------------------------------------------
# Point engines
# ---------------------------------------------------------------------------


class EdwardsEngine:
    """Extended twisted Edwards a=-1 (Curve25519/Ristretto): (..., 4, n, L)."""

    coords = 4
    curve = "ed25519"

    def __init__(self):
        from . import ed25519 as ed

        self.ctx = get_fold_ctx(ed.P)
        self.n = self.ctx.n
        self.consts_np = self.ctx.consts_block(
            [self.ctx.encode_value(ed.TWO_D)]
        )
        self._ed = ed

    def padd(self, consts, p, q):
        """add-2008-hwcd-3 unified (complete for Ristretto points)."""
        import jax.numpy as jnp

        f = FieldOps(self.n, consts)
        two_d = f.extra_const(0)
        X1, Y1, Z1, T1 = (p[..., i, :, :] for i in range(4))
        X2, Y2, Z2, T2 = (q[..., i, :, :] for i in range(4))
        A = f.mul(f.sub(Y1, X1), f.sub(Y2, X2))
        B = f.mul(f.add(Y1, X1), f.add(Y2, X2))
        C = f.mul(f.mul(T1, T2), two_d)
        zz = f.mul(Z1, Z2)
        D = f.carry(zz + zz)
        E = f.sub(B, A)
        F = f.sub(D, C)
        G = f.add(D, C)
        H = f.add(B, A)
        return jnp.stack(
            [f.mul(E, F), f.mul(G, H), f.mul(F, G), f.mul(E, H)], axis=-3
        )

    def pdouble(self, consts, p):
        """dbl-2008-hwcd (8 muls, identity-safe)."""
        import jax.numpy as jnp

        f = FieldOps(self.n, consts)
        X1, Y1, Z1 = (p[..., i, :, :] for i in range(3))
        A = f.mul(X1, X1)
        B = f.mul(Y1, Y1)
        zz = f.mul(Z1, Z1)
        C = f.carry(zz + zz)
        H = f.add(A, B)
        xy = f.add(X1, Y1)
        E = f.sub(H, f.mul(xy, xy))
        G = f.sub(A, B)
        F = f.add(C, G)
        return jnp.stack(
            [f.mul(E, F), f.mul(G, H), f.mul(F, G), f.mul(E, H)], axis=-3
        )

    def identity_np(self) -> np.ndarray:
        out = np.zeros((4, self.n), dtype=np.int32)
        out[1, 0] = 1
        out[2, 0] = 1
        return out

    def encode_points(self, points) -> np.ndarray:
        """Host extended points -> (K, 4, n) canonical limbs."""
        flat = [c for pt in points for c in pt]
        return self.ctx.encode_ints(flat).reshape(len(points), 4, self.n)

    def decode_points(self, arr_np) -> List[Tuple[int, int, int, int]]:
        """(B, 4, n) -> host extended points."""
        vals = self.ctx.decode(arr_np)
        return [tuple(vals[4 * i : 4 * i + 4]) for i in range(len(vals) // 4)]


class WeierstrassEngine:
    """Complete projective y^2 = x^3 + b, a=0 (RCB 2015 alg. 7).

    G1: field rows = 1, b3 = 9 (small multiply). G2: field rows = 2, b3 is a
    full Fq2 constant shipped in the consts block.
    """

    def __init__(self, curve: str, p: int, rows: int, b3_small=None, b3_rows=()):
        self.curve = curve
        self.ctx = get_fold_ctx(p)
        self.n = self.ctx.n
        self.rows = rows
        self.coords = 3 * rows
        self.b3_small = b3_small
        self.consts_np = self.ctx.consts_block(list(b3_rows))

    def _field(self, f: FieldOps):
        return _Fq(f) if self.rows == 1 else _Fq2(f)

    def _mul_b3(self, f: FieldOps, fld, x):
        import jax.numpy as jnp

        if self.b3_small is not None:
            return fld.smul(x, self.b3_small)
        b3 = jnp.stack([f._extra[0], f._extra[1]], axis=0)[..., :, None]  # (2, n, 1)
        return fld.mul(x, b3)

    def padd(self, consts, p, q):
        import jax.numpy as jnp

        f = FieldOps(self.n, consts)
        fld = self._field(f)
        r = self.rows
        X1, Y1, Z1 = p[..., 0:r, :, :], p[..., r : 2 * r, :, :], p[..., 2 * r :, :, :]
        X2, Y2, Z2 = q[..., 0:r, :, :], q[..., r : 2 * r, :, :], q[..., 2 * r :, :, :]
        t0 = fld.mul(X1, X2)
        t1 = fld.mul(Y1, Y2)
        t2 = fld.mul(Z1, Z2)
        t3 = fld.mul(fld.add(X1, Y1), fld.add(X2, Y2))
        t3 = fld.sub(t3, fld.add(t0, t1))
        t4 = fld.mul(fld.add(Y1, Z1), fld.add(Y2, Z2))
        t4 = fld.sub(t4, fld.add(t1, t2))
        X3 = fld.mul(fld.add(X1, Z1), fld.add(X2, Z2))
        Y3 = fld.sub(X3, fld.add(t0, t2))
        X3 = f.carry(t0 + t0 + t0)
        t2 = self._mul_b3(f, fld, t2)
        Z3 = fld.add(t1, t2)
        t1 = fld.sub(t1, t2)
        Y3 = self._mul_b3(f, fld, Y3)
        X3n = fld.sub(fld.mul(t3, t1), fld.mul(t4, Y3))
        Y3n = fld.add(fld.mul(t1, Z3), fld.mul(Y3, X3))
        Z3n = fld.add(fld.mul(Z3, t4), fld.mul(X3, t3))
        return jnp.concatenate([X3n, Y3n, Z3n], axis=-3)

    def pdouble(self, consts, p):
        return self.padd(consts, p, p)

    def identity_np(self) -> np.ndarray:
        out = np.zeros((self.coords, self.n), dtype=np.int32)
        out[self.rows, 0] = 1  # Y = 1 (c0)
        return out

    # -- host codecs (G1: Jacobian <-> projective) ---------------------------
    def encode_g1(self, points) -> np.ndarray:
        P = self.ctx.p
        flat = []
        for X, Y, Z in points:
            if Z % P == 0:
                flat += [0, 1, 0]
            else:
                flat += [X * Z % P, Y % P, Z * Z % P * Z % P]
        return self.ctx.encode_ints(flat).reshape(len(points), 3, self.n)

    def decode_g1(self, arr_np) -> List[Tuple[int, int, int]]:
        vals = self.ctx.decode(arr_np)
        P = self.ctx.p
        out = []
        for i in range(len(vals) // 3):
            X, Y, Z = vals[3 * i : 3 * i + 3]
            if Z == 0:
                out.append((1, 1, 0))
            else:
                out.append((X * Z % P, Y * Z % P * Z % P, Z))
        return out

    def encode_g2(self, points) -> np.ndarray:
        from . import bn254 as bn

        P = self.ctx.p
        flat = []
        for X, Y, Z in points:
            if Z[0] % P == 0 and Z[1] % P == 0:
                flat += [0, 0, 1, 0, 0, 0]
            else:
                z2 = bn.fq2_sq(Z)
                xp = bn.fq2_mul(X, Z)
                zp = bn.fq2_mul(z2, Z)
                flat += [xp[0], xp[1], Y[0] % P, Y[1] % P, zp[0], zp[1]]
        return self.ctx.encode_ints(flat).reshape(len(points), 6, self.n)

    def decode_g2(self, arr_np):
        from . import bn254 as bn

        vals = self.ctx.decode(arr_np)
        out = []
        for i in range(len(vals) // 6):
            x = (vals[6 * i], vals[6 * i + 1])
            y = (vals[6 * i + 2], vals[6 * i + 3])
            z = (vals[6 * i + 4], vals[6 * i + 5])
            if z == (0, 0):
                out.append((bn.FQ2_ONE, bn.FQ2_ONE, (0, 0)))
            else:
                out.append((bn.fq2_mul(x, z), bn.fq2_mul(y, bn.fq2_sq(z)), z))
        return out


@functools.lru_cache(maxsize=None)
def edwards_engine() -> EdwardsEngine:
    return EdwardsEngine()


@functools.lru_cache(maxsize=None)
def bn254_g1_engine() -> WeierstrassEngine:
    from . import bn254 as bn

    return WeierstrassEngine("bn254_g1", bn.P, rows=1, b3_small=9)


@functools.lru_cache(maxsize=None)
def bn254_g2_engine() -> WeierstrassEngine:
    from . import bn254 as bn

    b_twist = bn.fq2_mul_scalar(bn.fq2_inv((9, 1)), 3)
    b3 = bn.fq2_mul_scalar(b_twist, 3)
    ctx = get_fold_ctx(bn.P)
    return WeierstrassEngine(
        "bn254_g2",
        bn.P,
        rows=2,
        b3_small=None,
        b3_rows=(ctx.encode_value(b3[0]), ctx.encode_value(b3[1])),
    )


def get_engine(curve: str):
    if curve == "ed25519":
        return edwards_engine()
    if curve == "bn254_g1":
        return bn254_g1_engine()
    if curve == "bn254_g2":
        return bn254_g2_engine()
    raise ValueError(f"unknown curve {curve}")


# ---------------------------------------------------------------------------
# Pallas kernels: K-chunk tree accumulation + Horner window fold
# ---------------------------------------------------------------------------


def _tree_reduce(add_fn, v):
    """Halving reduction over axis 0 of (K, C, n, L).

    Pairs (i, i+half) so both operands are contiguous slices — a strided
    slice would lower to a >2-D gather, which Mosaic does not support."""
    import jax.numpy as jnp

    K = v.shape[0]
    while K > 1:
        half = K // 2
        s = add_fn(v[:half], v[half : 2 * half])
        if K % 2:
            s = jnp.concatenate([s, v[-1:]], axis=0)
        v = s
        K = (K + 1) // 2
    return v[0]


@backend_cached
def _window_sum_call(_backend, curve: str, Kp: int, B: int):
    """pallas_call: (consts, pts (Kp,C,n,B)) -> (C,n,B) tree sum.

    Grid: (B tiles, K chunks); the K axis accumulates into the revisited
    output block (sequential minor grid dim), so VMEM holds only one
    (K_CHUNK, C, n, B_TILE) block at a time.
    """
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    eng = get_engine(curve)
    C, n = eng.coords, eng.n
    bt = min(B_TILE, B)
    kc = min(K_CHUNK, Kp)
    assert Kp % kc == 0 and B % bt == 0

    if _interpret():
        # CPU backend: same math as plain XLA (interpreted Pallas is too slow)
        import jax.numpy as jnp

        def call_jnp(consts, pts):
            v = pts.astype(jnp.int32) if pts.dtype != jnp.int32 else pts
            return _tree_reduce(lambda a, b: eng.padd(consts, a, b), v)

        return call_jnp

    def kernel(c_ref, pts_ref, o_ref):
        k = pl.program_id(1)
        consts = c_ref[:]
        v = pts_ref[:].astype(jnp.int32)  # table blocks arrive int16
        w = _tree_reduce(lambda a, b: eng.padd(consts, a, b), v)

        @pl.when(k == 0)
        def _():
            o_ref[:] = w

        @pl.when(k != 0)
        def _():
            o_ref[:] = eng.padd(consts, o_ref[:], w)

    nc = eng.consts_np.shape[0]

    def call(consts, pts):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((C, n, B), jnp.int32),
            grid=(B // bt, Kp // kc),
            in_specs=[
                pl.BlockSpec((nc, n), lambda b, k: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec(
                    (kc, C, n, bt),
                    lambda b, k: (k, 0, 0, b),
                    memory_space=pltpu.VMEM,
                ),
            ],
            out_specs=pl.BlockSpec(
                (C, n, bt), lambda b, k: (0, 0, b), memory_space=pltpu.VMEM
            ),
            interpret=_interpret(),
        )(consts, pts)

    return call


@backend_cached
def _horner_call(_backend, curve: str, B: int):
    """pallas_call: (consts, acc, wsum) -> 2^8 * acc + wsum, blocks over B."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    eng = get_engine(curve)
    C, n = eng.coords, eng.n
    bt = min(B_TILE, B)
    nc = eng.consts_np.shape[0]

    if _interpret():

        def call_jnp(consts, acc, wsum):
            for _ in range(8):  # eager python loop: no XLA:CPU mega-compiles
                acc = eng.pdouble(consts, acc)
            return eng.padd(consts, acc, wsum)

        return call_jnp

    def kernel(c_ref, acc_ref, w_ref, o_ref):
        consts = c_ref[:]
        acc = acc_ref[:]
        # unrolled: a fori_loop here measured 8x slower (58 vs 7 us/call,
        # round-5 overhead probe) — Mosaic pipelines the straight line far
        # better than the rolled loop
        for _ in range(8):
            acc = eng.pdouble(consts, acc)
        o_ref[:] = eng.padd(consts, acc, w_ref[:])

    def call(consts, acc, wsum):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((C, n, B), jnp.int32),
            grid=(B // bt,),
            in_specs=[
                pl.BlockSpec((nc, n), lambda b: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((C, n, bt), lambda b: (0, 0, b), memory_space=pltpu.VMEM),
                pl.BlockSpec((C, n, bt), lambda b: (0, 0, b), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (C, n, bt), lambda b: (0, 0, b), memory_space=pltpu.VMEM
            ),
            interpret=_interpret(),
        )(consts, acc, wsum)

    return call


@backend_cached
def _pair_add_call(_backend, curve: str, K: int):
    """pallas_call: (consts, p (C,n,K), q (C,n,K)) -> p+q (table build step)."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    eng = get_engine(curve)
    C, n = eng.coords, eng.n
    nc = eng.consts_np.shape[0]

    if _interpret():
        return lambda consts, p, q: eng.padd(consts, p, q)

    def kernel(c_ref, p_ref, q_ref, o_ref):
        o_ref[:] = eng.padd(c_ref[:], p_ref[:], q_ref[:])

    def call(consts, p, q):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((C, n, K), jnp.int32),
            in_specs=[
                pl.BlockSpec((nc, n), memory_space=pltpu.VMEM),
                pl.BlockSpec((C, n, K), memory_space=pltpu.VMEM),
                pl.BlockSpec((C, n, K), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((C, n, K), memory_space=pltpu.VMEM),
            interpret=_interpret(),
        )(consts, p, q)

    return call


# ---------------------------------------------------------------------------
# MSM driver
# ---------------------------------------------------------------------------


def _pad_batch(B: int) -> int:
    for b in (8, 16, 32, 64, 128, 256, 512, 1024):
        if B <= b:
            return b
    return ((B + 1023) // 1024) * 1024


@backend_cached
def _msm_jit(_backend, curve: str, Kp: int, B: int):
    import jax
    import jax.numpy as jnp

    eng = get_engine(curve)
    C, n = eng.coords, eng.n
    wsum_call = _window_sum_call(curve, Kp, B)
    horner = _horner_call(curve, B)
    ident = np.broadcast_to(eng.identity_np()[..., None], (C, n, B))

    if _interpret():
        # CPU/tests: eager evaluation — the huge traced MSM graph makes
        # XLA:CPU compilation pathological, and per-op eager is fast enough
        # at test sizes.
        def run_eager(consts, table, digits):
            dw = _digits_to_windows(digits)
            koff = (jnp.arange(Kp, dtype=jnp.int32) * 256)[None, :]
            acc = jnp.asarray(ident)
            for w in range(dw.shape[0]):
                pts = jnp.take(table, dw[w] + koff, axis=0)
                pts = jnp.transpose(pts, (1, 2, 3, 0))
                acc = horner(consts, acc, wsum_call(consts, pts))
            return acc

        return run_eager

    @jax.jit
    def run(consts, table, digits):
        # table: (Kp*256, C, n); digits: (B, Kp, 32) scalar bytes
        dw = _digits_to_windows(digits)  # (NWIN, B, Kp) high first
        koff = (jnp.arange(Kp, dtype=jnp.int32) * 256)[None, :]

        def step(acc, dig):
            pts = jnp.take(table, dig + koff, axis=0)  # (B, Kp, C, n) int16
            pts = jnp.transpose(pts, (1, 2, 3, 0))  # widened inside the kernel
            w = wsum_call(consts, pts)
            return horner(consts, acc, w), None

        acc, _ = jax.lax.scan(step, jnp.asarray(ident), dw)
        return acc  # (C, n, B)

    return run


@backend_cached
def _msm_jit_v2(_backend, curve: str, Kp: int, B: int):
    """v2 MSM driver: the window gather runs as an int8 one-hot batched
    matmul on the MXU instead of an XLA row gather.

    Round-5 phase decomposition (scripts/bench_msm_phases.py /
    bench_msm_matgather.py, fetch-synced): the radix-256 take-gather +
    transpose cost ~34 ms of the ~62 ms device MSM at (K=129, B=512) —
    latency-bound HBM row fetches at ~4 GB/s. The same selection as

        pts[k, :, b] = table_int8[k] @ onehot(digit[k, b])

    lands directly in the kernel's (Kp, C, n, B) layout (no transpose),
    runs at MXU rates (~2.5 ms), and is bit-exact (int8 x int8 -> int32).
    """
    import jax
    import jax.numpy as jnp

    eng = get_engine(curve)
    C, n = eng.coords, eng.n
    CN = C * n
    wsum_call = _window_sum_call(curve, Kp, B)
    horner = _horner_call(curve, B)
    ident = np.broadcast_to(eng.identity_np()[..., None], (C, n, B))
    iota = np.arange(256, dtype=np.int32)[None, :, None]  # (1, 256, 1)

    @jax.jit
    def run(consts, hiT, loT, digits):
        # hiT/loT: (Kp, CN, 256) int8; digits: (B, Kp, 32) scalar bytes
        dw = _digits_to_windows(digits)  # (NWIN, B, Kp) high first
        io = jnp.asarray(iota)

        def step(acc, dig):
            d = jnp.transpose(dig, (1, 0))[:, None, :]  # (Kp, 1, B)
            oh = (d == io).astype(jnp.int8)  # (Kp, 256, B)

            def bmm(t8):
                return jax.lax.dot_general(
                    t8, oh,
                    dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.int32,
                )  # (Kp, CN, B)

            pts = (bmm(hiT) * 256 + bmm(loT)).reshape(Kp, C, n, B)
            w = wsum_call(consts, pts)
            return horner(consts, acc, w), None

        acc, _ = jax.lax.scan(step, jnp.asarray(ident), dw)
        return acc  # (C, n, B)

    return run


@backend_cached
def _window_fused_call(_backend, curve: str, Kp: int, B: int):
    """pallas_call: fused one-hot int8 MXU gather + tree window-sum.

    (consts, packedT (Kp, 2*CN, 256) i8, dig (Kp, B) i32) -> (C, n, B) i32.

    v2 materialized the gathered (Kp, C, n, B) int32 block in HBM between
    the XLA matmul and the window-sum kernel (~34 ms of traffic per MSM
    batch at B=512); doing the int8 dot INSIDE the kernel keeps everything
    in VMEM — the only HBM reads are the int8 table slices and digits.
    """
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    eng = get_engine(curve)
    C, n = eng.coords, eng.n
    CN = C * n
    bt = min(B_TILE, B)
    kc = min(K_CHUNK, Kp)
    assert Kp % kc == 0 and B % bt == 0
    nc = eng.consts_np.shape[0]

    if _interpret():
        # CPU backend: plain jnp one-hot gather + tree (interpreted Pallas
        # is too slow and the block constraints don't fit tiny test batches)
        import jax.numpy as jnp

        def call_jnp(consts, packedT, dig):
            oh = (
                dig[:, None, :] == jnp.arange(256, dtype=jnp.int32)[None, :, None]
            ).astype(jnp.int32)  # (Kp, 256, B)
            out = jnp.einsum(
                "kcd,kdb->kcb", packedT.astype(jnp.int32), oh
            )  # (Kp, 2*CN, B)
            pts = (out[:, :CN] * 256 + out[:, CN:]).reshape(Kp, C, n, B)
            return _tree_reduce(lambda a, b: eng.padd(consts, a, b), pts)

        return call_jnp

    def kernel(c_ref, t_ref, d_ref, o_ref):
        k = pl.program_id(1)
        consts = c_ref[:]
        dig = d_ref[:]  # (kc, bt)
        iot = jax.lax.broadcasted_iota(jnp.int32, (256, bt), 0)

        def gathered(j):
            oh = (dig[j][None, :] == iot).astype(jnp.int8)  # (256, bt)
            out = jax.lax.dot_general(
                t_ref[j], oh, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )  # (2*CN, bt): rows [hi; lo]
            return (out[:CN] * 256 + out[CN:]).reshape(C, n, bt)

        # pair-combine during generation so at most kc/2 point blocks are
        # live at once (kc full blocks blew the scoped-VMEM limit), then a
        # python-list tree: no jnp.stack/concatenate — stacking kc/2 blocks
        # into one buffer cost a multi-MB VMEM copy per grid step
        lv = [
            eng.padd(consts, gathered(2 * j), gathered(2 * j + 1))
            for j in range(kc // 2)
        ]
        while len(lv) > 1:
            half = len(lv) // 2
            nxt = [
                eng.padd(consts, lv[i], lv[half + i]) for i in range(half)
            ]
            if len(lv) % 2:
                nxt.append(lv[-1])
            lv = nxt
        w = lv[0]

        @pl.when(k == 0)
        def _():
            o_ref[:] = w

        @pl.when(k != 0)
        def _():
            o_ref[:] = eng.padd(consts, o_ref[:], w)

    def call(consts, packedT, dig):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((C, n, B), jnp.int32),
            grid=(B // bt, Kp // kc),
            in_specs=[
                pl.BlockSpec((nc, n), lambda b, k: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec(
                    (kc, 2 * CN, 256), lambda b, k: (k, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (kc, bt), lambda b, k: (k, b), memory_space=pltpu.VMEM
                ),
            ],
            out_specs=pl.BlockSpec(
                (C, n, bt), lambda b, k: (0, 0, b), memory_space=pltpu.VMEM
            ),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=96 * 1024 * 1024,
            ),
            interpret=_interpret(),
        )(consts, packedT, dig)

    return call


WIN_GROUP = 4  # windows gathered per MXU dot in the v4 kernel


@backend_cached
def _window_fused4_call(_backend, curve: str, Kp: int, B: int):
    """Fused gather + tree for WIN_GROUP windows at once.

    (consts, packedT (Kp,2CN,256) i8, dig (WG, Kp, B) i32) -> (C, n, WG*B).

    One MXU dot per point-chunk now covers WIN_GROUP windows (the one-hot
    gains WG*bt columns), cutting the per-dot pipeline latency 4x, and the
    tree padds run on WG*bt-lane arrays — wider VPU vectors for the same
    total work.
    """
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    WG = WIN_GROUP
    eng = get_engine(curve)
    C, n = eng.coords, eng.n
    CN = C * n
    bt = min(B_TILE, B)
    kc = min(K_CHUNK, Kp)
    assert Kp % kc == 0 and B % bt == 0
    nc = eng.consts_np.shape[0]

    if _interpret():
        import jax.numpy as jnp

        def call_jnp(consts, packedT, dig):
            d = dig.reshape(WG, Kp, B)
            d = jnp.transpose(d, (1, 0, 2)).reshape(Kp, WG * B)
            oh = (
                d[:, None, :] == jnp.arange(256, dtype=jnp.int32)[None, :, None]
            ).astype(jnp.int32)
            out = jnp.einsum("kcd,kdb->kcb", packedT.astype(jnp.int32), oh)
            pts = (out[:, :CN] * 256 + out[:, CN:]).reshape(Kp, C, n, WG * B)
            return _tree_reduce(lambda a, b: eng.padd(consts, a, b), pts)

        return call_jnp

    def kernel(c_ref, t_ref, d_ref, o_ref):
        k = pl.program_id(1)
        consts = c_ref[:]
        dig = d_ref[:]  # (WG, kc, bt)
        iot = jax.lax.broadcasted_iota(jnp.int32, (256, WG * bt), 0)

        def gathered(j):
            # (WG, bt) digits for point j -> (256, WG*bt) one-hot
            dj = jnp.transpose(dig[:, j, :], (0, 1)).reshape(1, WG * bt)
            oh = (dj == iot).astype(jnp.int8)
            out = jax.lax.dot_general(
                t_ref[j], oh, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )  # (2CN, WG*bt)
            return (out[:CN] * 256 + out[CN:]).reshape(C, n, WG * bt)

        lv = [
            eng.padd(consts, gathered(2 * j), gathered(2 * j + 1))
            for j in range(kc // 2)
        ]
        while len(lv) > 1:
            half = len(lv) // 2
            nxt = [eng.padd(consts, lv[i], lv[half + i]) for i in range(half)]
            if len(lv) % 2:
                nxt.append(lv[-1])
            lv = nxt
        w = lv[0]

        @pl.when(k == 0)
        def _():
            o_ref[:] = w

        @pl.when(k != 0)
        def _():
            o_ref[:] = eng.padd(consts, o_ref[:], w)

    def call(consts, packedT, dig):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((C, n, WG * B), jnp.int32),
            grid=(B // bt, Kp // kc),
            in_specs=[
                pl.BlockSpec((nc, n), lambda b, k: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec(
                    (kc, 2 * CN, 256), lambda b, k: (k, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (WG, kc, bt), lambda b, k: (0, k, b),
                    memory_space=pltpu.VMEM,
                ),
            ],
            out_specs=pl.BlockSpec(
                (C, n, WG * bt), lambda b, k: (0, 0, b), memory_space=pltpu.VMEM
            ),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=110 * 1024 * 1024,
            ),
            interpret=_interpret(),
        )(consts, packedT, dig)

    return call


@backend_cached
def _horner4_call(_backend, curve: str, B: int):
    """(consts, acc (C,n,B), wsums (C,n,WG*B)) -> WG Horner steps."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    WG = WIN_GROUP
    eng = get_engine(curve)
    C, n = eng.coords, eng.n
    bt = min(B_TILE, B)
    nc = eng.consts_np.shape[0]

    if _interpret():

        def body(consts, acc, wsums):
            width = wsums.shape[-1] // WG
            for wdx in range(WG):
                for _ in range(8):
                    acc = eng.pdouble(consts, acc)
                acc = eng.padd(
                    consts, acc, wsums[..., wdx * width : (wdx + 1) * width]
                )
            return acc

        return body

    def kernel(c_ref, a_ref, w_ref, o_ref):
        consts = c_ref[:]
        acc = a_ref[:]
        wsums = w_ref[:]  # (C, n, WG*bt)
        for wdx in range(WG):
            for _ in range(8):
                acc = eng.pdouble(consts, acc)
            acc = eng.padd(
                consts, acc, wsums[..., wdx * bt : (wdx + 1) * bt]
            )
        o_ref[:] = acc

    def call(consts, acc, wsums):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((C, n, B), jnp.int32),
            grid=(B // bt,),
            in_specs=[
                pl.BlockSpec((nc, n), lambda b: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((C, n, bt), lambda b: (0, 0, b), memory_space=pltpu.VMEM),
                pl.BlockSpec(
                    (C, n, WIN_GROUP * bt), lambda b: (0, 0, b),
                    memory_space=pltpu.VMEM,
                ),
            ],
            out_specs=pl.BlockSpec(
                (C, n, bt), lambda b: (0, 0, b), memory_space=pltpu.VMEM
            ),
            interpret=_interpret(),
        )(consts, acc, wsums)

    return call


@backend_cached
def _msm_jit_v4(_backend, curve: str, Kp: int, B: int):
    """v4 MSM driver: WIN_GROUP windows per fused gather+tree kernel."""
    import jax
    import jax.numpy as jnp

    WG = WIN_GROUP
    assert NWIN % WG == 0
    eng = get_engine(curve)
    C, n = eng.coords, eng.n
    fused = _window_fused4_call(curve, Kp, B)
    horner = _horner4_call(curve, B)
    ident = np.broadcast_to(eng.identity_np()[..., None], (C, n, B))

    @jax.jit
    def run(consts, packedT, digits):
        dw = _digits_to_windows(digits)  # (NWIN, B, Kp) high first
        dwg = jnp.transpose(dw, (0, 2, 1)).reshape(NWIN // WG, WG, Kp, B)

        def step(acc, dig):
            w = fused(consts, packedT, dig)  # (C, n, WG*B)
            return horner(consts, acc, w), None

        acc, _ = jax.lax.scan(step, jnp.asarray(ident), dwg)
        return acc  # (C, n, B)

    return run


@backend_cached
def _msm_jit_v3(_backend, curve: str, Kp: int, B: int):
    """v3 MSM driver: fused in-kernel int8 MXU gather + tree sum per window."""
    import jax
    import jax.numpy as jnp

    eng = get_engine(curve)
    C, n = eng.coords, eng.n
    fused = _window_fused_call(curve, Kp, B)
    horner = _horner_call(curve, B)
    ident = np.broadcast_to(eng.identity_np()[..., None], (C, n, B))

    @jax.jit
    def run(consts, packedT, digits):
        dw = _digits_to_windows(digits)  # (NWIN, B, Kp) high first

        def step(acc, dig):
            w = fused(consts, packedT, jnp.transpose(dig, (1, 0)))
            return horner(consts, acc, w), None

        acc, _ = jax.lax.scan(step, jnp.asarray(ident), dw)
        return acc  # (C, n, B)

    return run


def _msm_impl() -> str:
    import os

    flag = os.environ.get("LIBZKP_MSM_IMPL")
    if flag in ("v1", "v2", "v3", "v4"):
        return flag
    return "v1" if _interpret() else "v4"


@backend_cached
def _table_build_jit(_backend, curve: str, K: int):
    import jax
    import jax.numpy as jnp

    eng = get_engine(curve)
    C, n = eng.coords, eng.n
    pair_add = _pair_add_call(curve, K)
    ident = np.broadcast_to(eng.identity_np()[..., None], (C, n, K))

    def build_impl(consts, base, scan):  # base (K, C, n)
        baseT = jnp.transpose(base, (1, 2, 0))  # (C, n, K)
        if scan:

            def step(acc, _):
                nxt = pair_add(consts, acc, baseT)
                return nxt, nxt

            _, rows = jax.lax.scan(step, jnp.asarray(ident), None, length=255)
        else:
            acc = jnp.asarray(ident)
            out = []
            for _ in range(255):
                acc = pair_add(consts, acc, baseT)
                out.append(acc)
            rows = jnp.stack(out, axis=0)
        table = jnp.concatenate([jnp.asarray(ident)[None], rows], axis=0)
        # (256, C, n, K) -> (K, 256, C, n) -> (K*256, C, n); int16 storage
        # halves HBM gather traffic (relaxed limbs are < 2^13)
        return jnp.transpose(table, (3, 0, 1, 2)).reshape(K * 256, C, n).astype(jnp.int16)

    if _interpret():
        return lambda consts, base: build_impl(consts, base, scan=False)
    return jax.jit(lambda consts, base: build_impl(consts, base, scan=True))


def _host_table(curve: str, points, Kp: int) -> np.ndarray:
    """Host-built multiples table (CPU/test path): (Kp*256, C, n) limbs."""
    eng = get_engine(curve)
    if curve == "ed25519":
        from . import ed25519 as ed

        add, ident, enc = ed.point_add, (0, 1, 1, 0), eng.encode_points
    elif curve == "bn254_g1":
        from . import bn254 as bn

        add, ident, enc = bn.g1_add, bn.G1_INF, eng.encode_g1
    else:
        from . import bn254 as bn

        add, ident, enc = bn.g2_add, bn.G2_INF, eng.encode_g2
    rows = []
    for pt in points:
        acc = ident
        rows.append(ident)
        for _ in range(255):
            acc = add(acc, pt)
            rows.append(acc)
    for _ in range(Kp - len(points)):
        rows.extend([ident] * 256)
    return enc(rows)


class DeviceTable:
    """A basis's on-device radix-256 multiples table (K padded to K_CHUNK)."""

    def __init__(self, curve: str, base_np: np.ndarray, host_points=None):
        import jax.numpy as jnp

        eng = get_engine(curve)
        self.curve = curve
        self.K = base_np.shape[0]
        kc = min(K_CHUNK, _pad_batch(self.K))
        self.Kp = ((self.K + kc - 1) // kc) * kc
        self.consts = jnp.asarray(eng.consts_np)
        if _interpret() and host_points is not None:
            # CPU/tests: device eager build is slow; host big-int build is not
            self.table = jnp.asarray(
                _host_table(curve, host_points, self.Kp).astype(np.int16)
            )
            return
        if self.Kp != self.K:
            pad = np.broadcast_to(
                eng.identity_np()[None], (self.Kp - self.K, eng.coords, eng.n)
            )
            base_np = np.concatenate([base_np, pad], axis=0)
        self.table = _table_build_jit(curve, self.Kp)(
            self.consts, jnp.asarray(base_np)
        )
        self.table.block_until_ready()

    @property
    def table_int8(self):
        """(hiT, loT): the table as int8 halves, (Kp, C*n, 256) each.

        Feeds the MXU one-hot gather of the v2 MSM driver
        (``pts = table @ onehot(digits)``): splitting each int16 limb as
        ``limb = hi * 256 + lo`` with lo in [-128, 127] keeps both factors
        int8 so the batched matmul accumulates exactly in int32. Built once
        per table, on device.
        """
        if not hasattr(self, "_int8"):
            import jax
            import jax.numpy as jnp

            eng = get_engine(self.curve)
            CN = eng.coords * eng.n

            @jax.jit
            def split(t):
                t32 = t.astype(jnp.int32).reshape(self.Kp, 256, CN)
                lo = ((t32 + 128) & 255) - 128
                hi = (t32 - lo) >> 8
                tr = lambda x: jnp.transpose(x, (0, 2, 1)).astype(jnp.int8)
                return tr(hi), tr(lo)

            self._int8 = split(self.table)
        return self._int8

    @property
    def table_int8_packed(self):
        """(Kp, 2*C*n, 256) int8: rows [hi(C*n); lo(C*n)] per entry.

        One MXU dot per point-chunk yields both halves — the v3 kernel's
        dot count halves versus separate hi/lo tables."""
        if not hasattr(self, "_int8p"):
            import jax.numpy as jnp

            hiT, loT = self.table_int8
            self._int8p = jnp.concatenate([hiT, loT], axis=1)
        return self._int8p


def build_table_ed25519(points) -> DeviceTable:
    return DeviceTable(
        "ed25519", edwards_engine().encode_points(points), host_points=points
    )


def build_table_bn254_g1(points) -> DeviceTable:
    return DeviceTable(
        "bn254_g1", bn254_g1_engine().encode_g1(points), host_points=points
    )


def build_table_bn254_g2(points) -> DeviceTable:
    return DeviceTable(
        "bn254_g2", bn254_g2_engine().encode_g2(points), host_points=points
    )


def _digits_from_scalars(scalar_vecs, K: int, Kp: int) -> np.ndarray:
    """(B, K) scalars -> (B, Kp, 32) uint8 scalar bytes (window digits).

    Kept contiguous in scalar-byte order; the device transposes to
    (NWIN, B, Kp) high-window-first (a host transpose of this array costs
    ~250 ms at B=1024 — on device it is free). Padded basis columns get
    digit 0 (-> identity table rows)."""
    buf = b"".join(
        [int(s).to_bytes(SCALAR_BYTES, "little") for vec in scalar_vecs for s in vec]
    )
    arr = np.frombuffer(buf, dtype=np.uint8).reshape(
        len(scalar_vecs), K, SCALAR_BYTES
    )
    if Kp != K:
        arr = np.pad(arr, ((0, 0), (0, Kp - K), (0, 0)))
    return arr


def _digits_to_windows(digits):
    """(B, Kp, 32) uint8 device array -> (NWIN, B, Kp) int32, high first."""
    import jax.numpy as jnp

    return jnp.flip(
        jnp.transpose(digits.astype(jnp.int32), (2, 0, 1)), axis=0
    )


def _decode(curve: str, out_np: np.ndarray, B: int):
    eng = get_engine(curve)
    pts_np = np.transpose(out_np, (2, 0, 1))[:B]  # (B, C, n)
    if curve == "ed25519":
        return eng.decode_points(pts_np)
    if curve == "bn254_g1":
        return eng.decode_g1(pts_np)
    return eng.decode_g2(pts_np)


def msm_many(table: DeviceTable, scalar_vecs: Sequence[Sequence[int]]):
    """Batch of independent MSMs over one fixed basis — ONE device dispatch.

    Returns host points (extended Edwards / Jacobian, matching the host
    tiers' representations).
    """
    import jax.numpy as jnp

    B = len(scalar_vecs)
    if B == 0:
        return []
    digits = _digits_from_scalars(scalar_vecs, table.K, table.Kp)
    Bp = _pad_batch(B)
    if Bp != B:
        digits = np.pad(digits, ((0, Bp - B), (0, 0), (0, 0)))
    impl = _msm_impl()
    if impl == "v4":
        out = _msm_jit_v4(table.curve, table.Kp, Bp)(
            table.consts, table.table_int8_packed, jnp.asarray(digits)
        )
    elif impl == "v3":
        out = _msm_jit_v3(table.curve, table.Kp, Bp)(
            table.consts, table.table_int8_packed, jnp.asarray(digits)
        )
    elif impl == "v2":
        hiT, loT = table.table_int8
        out = _msm_jit_v2(table.curve, table.Kp, Bp)(
            table.consts, hiT, loT, jnp.asarray(digits)
        )
    else:
        out = _msm_jit(table.curve, table.Kp, Bp)(
            table.consts, table.table, jnp.asarray(digits)
        )
    return _decode(table.curve, np.asarray(out), B)


# ---------------------------------------------------------------------------
# Mesh-sharded variant: batch over 'dp', basis over 'shard'
# ---------------------------------------------------------------------------


def msm_many_sharded(table: DeviceTable, scalar_vecs, mesh=None):
    """MSM batch over the (dp, shard) mesh.

    Rows shard over ``dp``; each dp-group's chips split the basis over
    ``shard``, tree-reduce their slice locally, and combine partial sums with
    an all-gather + on-device fold. Falls back to :func:`msm_many` on a
    single device.
    """
    import jax
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P

    try:
        from jax import shard_map
    except ImportError:  # pragma: no cover - older jax
        from jax.experimental.shard_map import shard_map

    from ..parallel import mesh as meshmod

    mesh = mesh or meshmod.get_mesh()
    dp = mesh.shape["dp"]
    shard = mesh.shape["shard"]
    if dp * shard <= 1:
        return msm_many(table, scalar_vecs)
    if next(iter(mesh.devices.flat)).platform == "cpu":
        # virtual CPU mesh while the process default backend is an
        # accelerator (dryrun/tests): kernels must build interpret variants
        from .limbfold import force_interpret

        with force_interpret():
            return _msm_many_sharded_impl(table, scalar_vecs, mesh)
    return _msm_many_sharded_impl(table, scalar_vecs, mesh)


def _msm_many_sharded_impl(table: DeviceTable, scalar_vecs, mesh):
    import jax
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P

    from jax import shard_map

    from ..parallel import mesh as meshmod

    dp = mesh.shape["dp"]
    shard = mesh.shape["shard"]

    B = len(scalar_vecs)
    if B == 0:
        return []
    eng = get_engine(table.curve)
    C, n = eng.coords, eng.n
    kc = min(K_CHUNK, table.Kp)
    # basis slice per shard chip, padded to the K chunk
    k_local = ((table.Kp + shard - 1) // shard + kc - 1) // kc * kc
    Kp = k_local * shard
    digits = _digits_from_scalars(scalar_vecs, table.K, Kp)
    Bp = meshmod.pad_to_multiple(_pad_batch(max(B, dp)), dp)
    if Bp != B:
        digits = np.pad(digits, ((0, Bp - B), (0, 0), (0, 0)))
    b_local = Bp // dp

    table_arr = table.table.reshape(table.Kp, 256, C, n)
    if Kp != table.Kp:
        pad_rows = np.broadcast_to(
            eng.identity_np().astype(np.int16)[None, None], (Kp - table.Kp, 256, C, n)
        )
        table_arr = jnp.concatenate([table_arr, jnp.asarray(pad_rows)], axis=0)

    wsum_call = _window_sum_call(table.curve, k_local, b_local)
    horner = _horner_call(table.curve, b_local)
    ident = np.broadcast_to(eng.identity_np()[..., None], (C, n, b_local))

    def local_msm(consts, tbl, digs):
        # tbl: (k_local, 256, C, n) — this chip's basis slice
        # digs: (b_local, Kp, 32) — full scalar bytes for our dp rows
        my = jax.lax.axis_index("shard")
        digs = jax.lax.dynamic_slice_in_dim(digs, my * k_local, k_local, axis=1)
        dw = _digits_to_windows(digs)  # (NWIN, b_local, k_local)
        flat = tbl.reshape(k_local * 256, C, n)
        koff = (jnp.arange(k_local, dtype=jnp.int32) * 256)[None, :]

        def step(acc, dig):
            pts = jnp.take(flat, dig + koff, axis=0)
            pts = jnp.transpose(pts, (1, 2, 3, 0))  # widened inside the kernel
            w = wsum_call(consts, pts)
            return horner(consts, acc, w), None

        acc, _ = jax.lax.scan(step, jnp.asarray(ident), dw)
        # combine partial sums across the shard axis (collective layer)
        from ..parallel import collective

        return collective.reduce_points(
            lambda a, b: eng.padd(consts, a, b), acc, axis="shard"
        )

    fn = shard_map(
        local_msm,
        mesh=mesh,
        in_specs=(P(), P("shard"), P("dp")),
        out_specs=P(None, None, "dp"),
        check_vma=False,
    )
    out = jax.jit(fn)(table.consts, table_arr, jnp.asarray(digits))
    return _decode(table.curve, np.asarray(out), B)


# ---------------------------------------------------------------------------
# Device Ristretto255 compression (RFC 9496 ENCODE) on the fold field
# ---------------------------------------------------------------------------
# Closes the last host-only piece of the curve25519-dalek replacement
# (SURVEY.md §2.2 row 1): the batched encode runs on-device over (n, B)
# fold-limb lanes — canonicalization, SQRT_RATIO_M1's 2^252-3 power chain,
# sign selection and the final canonical reduction are all jnp on the same
# FieldOps the Pallas point kernels use. Differential-tested lane-for-lane
# against ops/ed25519.compress (tests/test_curve_jax.py).


def _canon_bias_np(n: int) -> np.ndarray:
    """A multiple of p, redistributed so every limb is large enough to
    absorb the worst-case negative carries of a relaxed fold value
    (including the signed top-limb wrap through ONE = 2^(12n) mod p, which
    lands on whichever limbs ONE occupies).

    16p reaches limb 21; rows above it are zeroed by the top-fold stage of
    :func:`_fold_canonicalize` before the bias is added, so they need no
    floor (carries into them stay non-negative)."""
    p = (1 << 255) - 19
    from .limbfold import int_to_limbs

    m = 16
    d = int_to_limbs(m * p, n).astype(np.int64)
    one = int_to_limbs((1 << (12 * n)) % p, n).astype(np.int64)
    floors = 8 + 4 * one
    floors[0] += 1 << 13
    floors[22:] = 0  # zeroed by the top-fold stage; carries in are >= 0
    top = min(n, 22)
    # greedy top-down redistribution: a unit at limb i+1 is 4096 at limb i
    for i in range(top - 1, 0, -1):
        need = floors[i - 1] - d[i - 1]
        if need > 0:
            take = (need + 4095) // 4096
            d[i] -= take
            d[i - 1] += take << 12
        assert d[i] >= floors[i], f"bias redistribution failed at limb {i}"
    assert d[0] >= floors[0]
    assert sum(int(v) << (12 * i) for i, v in enumerate(d)) % p == 0
    return d.astype(np.int32)


def _fold_canonicalize(f, x):
    """Relaxed signed fold limbs -> canonical limbs in [0, 2^12), value < p.

    Signed carry passes restore limb bounds, a redistributed 16p bias makes
    every limb (and the value) non-negative, two 19*(v >> 255) folds bring
    the value under 2^255 + 19, and one branch-free conditional subtract
    lands on the canonical representative of GF(2^255 - 19).
    """
    import jax.numpy as jnp

    n = f.n
    for _ in range(3):
        x = f.carry(x)
    # Top-fold (n > 22 layouts): rows >= 22 carry weight 2^264+ and would
    # blow the |value| < ~2^266 budget the 19*(v>>255) folds below assume.
    # Replace each with its residue: 2^(12j) mod p spread over low limbs.
    if n > 22:
        from .limbfold import int_to_limbs as _i2l

        for j in range(22, n):
            ej = _i2l((1 << (12 * j)) % ((1 << 255) - 19), n).astype(np.int64)
            nz = [(i, int(v)) for i, v in enumerate(ej) if v]
            row = x[..., j, :]
            upd = jnp.zeros_like(x)
            for i, v in nz:
                upd = upd.at[..., i, :].add(row * jnp.int32(v))
            x = jnp.concatenate(
                [x[..., :j, :], jnp.zeros_like(x[..., j : j + 1, :]), x[..., j + 1 :, :]],
                axis=-2,
            ) + upd
        x = f.carry(f.carry(x))
    # after the passes: limb 0 in [-9728, 13824), other limbs >= -4, and
    # the VALUE is > -2p; adding the redistributed 16p makes both the limbs
    # and the value non-negative without changing the residue.
    bias = jnp.asarray(_canon_bias_np(n))[..., :, None]
    x = x + bias
    # full cascades below: one parallel carry pass cannot propagate a ripple
    # through a run of all-ones limbs (e.g. the representative p itself), so
    # strict-limb form needs up to n passes.
    for _ in range(n):
        x = f.carry(x)
    # fold bits >= 255 back as * 19. Bit 255 = limb TI (=21) bit 3; any
    # limbs above TI hold bits 264+ (n > 22 layouts) and are small after
    # the strict passes (value < 2^281), so the assembled hi fits int32.
    TI = 255 // 12  # 21

    def hi_bits(v):
        h = v[..., TI, :] >> 3
        for j in range(TI + 1, n):
            h = h + (v[..., j, :] << (12 * (j - TI) - 3))
        return h

    def mod_2_255(v):
        return jnp.concatenate(
            [
                v[..., :TI, :],
                v[..., TI : TI + 1, :] & 7,
                jnp.zeros_like(v[..., TI + 1 :, :]),
            ],
            axis=-2,
        )

    for _ in range(2):
        hi = hi_bits(x)
        x = mod_2_255(x).at[..., 0, :].add(19 * hi)
        for _ in range(n):
            x = f.carry(x)
    # conditional subtract: v >= p  <=>  (v + 19) has bit 255 set
    w = x.at[..., 0, :].add(19)
    for _ in range(n):
        w = f.carry(w)
    ge = hi_bits(w) > 0  # (B,)
    w_mod = mod_2_255(w)
    return jnp.where(ge[..., None, :], w_mod, x)


def _fold_eq(f, a_canon, b_canon):
    import jax.numpy as jnp

    return jnp.all(a_canon == b_canon, axis=-2)


def _fold_pow_p58(f, v):
    """v^((p-5)/8) = v^(2^252 - 3): the standard 25519 addition chain."""
    def sq_n(t, k):
        for _ in range(k):
            t = f.mul(t, t)
        return t

    t0 = f.mul(v, v)                      # 2
    t1 = sq_n(t0, 2)                      # 8
    t1 = f.mul(t1, v)                     # 9
    t0 = f.mul(t0, t1)                    # 11
    t0 = f.mul(t0, t0)                    # 22
    t0 = f.mul(t0, t1)                    # 31 = 2^5 - 1
    t1 = sq_n(t0, 5)
    t0 = f.mul(t1, t0)                    # 2^10 - 1
    t1 = sq_n(t0, 10)
    t1 = f.mul(t1, t0)                    # 2^20 - 1
    t2 = sq_n(t1, 20)
    t1 = f.mul(t2, t1)                    # 2^40 - 1
    t1 = sq_n(t1, 10)
    t0 = f.mul(t1, t0)                    # 2^50 - 1
    t1 = sq_n(t0, 50)
    t1 = f.mul(t1, t0)                    # 2^100 - 1
    t2 = sq_n(t1, 100)
    t1 = f.mul(t2, t1)                    # 2^200 - 1
    t1 = sq_n(t1, 50)
    t0 = f.mul(t1, t0)                    # 2^250 - 1
    t0 = sq_n(t0, 2)
    return f.mul(t0, v)                   # 2^252 - 3


def _compress_impl(consts, pts):
    """(B, 4, n, 1?) -> canonical s limbs (n, B). pts: (4, n, B)."""
    import jax.numpy as jnp

    from . import ed25519 as ed
    from .limbfold import FieldOps

    eng = edwards_engine()
    f = FieldOps(eng.n, consts)
    sqrt_m1 = f.extra_const(1)
    invsqrt_amd = f.extra_const(2)
    one = f.extra_const(3)

    X, Y, Z, T = (pts[..., i, :, :] for i in range(4))
    u1 = f.mul(f.add(Z, Y), f.sub(Z, Y))
    u2 = f.mul(X, Y)
    A = f.mul(u1, f.mul(u2, u2))
    # SQRT_RATIO_M1(1, A): r = A^3 * (A^7)^((p-5)/8) ... with u = 1:
    v3 = f.mul(f.mul(A, A), A)
    v7 = f.mul(f.mul(v3, v3), A)
    r = f.mul(v3, _fold_pow_p58(f, v7))
    check = f.mul(A, f.mul(r, r))
    check_c = _fold_canonicalize(f, check)
    one_c = _fold_canonicalize(f, jnp.broadcast_to(one, check.shape))
    neg_one_c = _fold_canonicalize(f, f.sub(jnp.zeros_like(check), one))
    neg_sqm1_c = _fold_canonicalize(
        f, f.sub(jnp.zeros_like(check), jnp.broadcast_to(sqrt_m1, check.shape))
    )
    flipped = _fold_eq(f, check_c, neg_one_c) | _fold_eq(f, check_c, neg_sqm1_c)
    r = jnp.where(flipped[..., None, :], f.mul(r, sqrt_m1), r)
    r_c = _fold_canonicalize(f, r)
    r_neg_c = _fold_canonicalize(f, f.sub(jnp.zeros_like(r), r_c))
    invsqrt = jnp.where((r_c[..., 0, :] & 1)[..., None, :] == 1, r_neg_c, r_c)

    den1 = f.mul(invsqrt, u1)
    den2 = f.mul(invsqrt, u2)
    z_inv = f.mul(f.mul(den1, den2), T)
    tz_c = _fold_canonicalize(f, f.mul(T, z_inv))
    rotate = (tz_c[..., 0, :] & 1) == 1
    Xr = jnp.where(rotate[..., None, :], f.mul(Y, sqrt_m1), X)
    Yr = jnp.where(rotate[..., None, :], f.mul(X, sqrt_m1), Y)
    den_inv = jnp.where(
        rotate[..., None, :], f.mul(den1, invsqrt_amd), den2
    )
    xz_c = _fold_canonicalize(f, f.mul(Xr, z_inv))
    neg_x = (xz_c[..., 0, :] & 1) == 1
    Yf = jnp.where(neg_x[..., None, :], f.sub(jnp.zeros_like(Yr), Yr), Yr)
    s = f.mul(den_inv, f.sub(Z, Yf))
    s_c = _fold_canonicalize(f, s)
    s_neg_c = _fold_canonicalize(f, f.sub(jnp.zeros_like(s), s_c))
    return jnp.where((s_c[..., 0, :] & 1)[..., None, :] == 1, s_neg_c, s_c)


@backend_cached
def _compress_jit(_backend, B: int):
    import jax

    if _interpret():
        return _compress_impl
    return jax.jit(_compress_impl)


def ristretto_compress_device(points) -> List[bytes]:
    """Batched RFC 9496 ENCODE of host extended points, on-device."""
    import jax.numpy as jnp

    eng = edwards_engine()
    B = len(points)
    enc = eng.encode_points(points)  # (B, 4, n)
    pts = jnp.asarray(np.transpose(enc, (1, 2, 0)))  # (4, n, B)
    consts = jnp.asarray(_compress_consts())
    s = np.asarray(_compress_jit(B)(consts, pts))  # (n, B)
    vals = eng.ctx.decode(np.transpose(s, (1, 0)))
    return [int(v).to_bytes(32, "little") for v in vals]


def _sqrt_ratio_1v(f, A, sqrt_m1):
    """RFC 9496 SQRT_RATIO_M1 with u = 1: (was_square (B,), r (n, B))."""
    import jax.numpy as jnp

    v3 = f.mul(f.mul(A, A), A)
    v7 = f.mul(f.mul(v3, v3), A)
    r = f.mul(v3, _fold_pow_p58(f, v7))
    check = f.mul(A, f.mul(r, r))
    check_c = _fold_canonicalize(f, check)
    one_b = jnp.broadcast_to(f.extra_const(3), check.shape)
    one_c = _fold_canonicalize(f, one_b)
    neg_one_c = _fold_canonicalize(f, f.sub(jnp.zeros_like(check), one_b))
    neg_sqm1_c = _fold_canonicalize(
        f, f.sub(jnp.zeros_like(check), jnp.broadcast_to(sqrt_m1, check.shape))
    )
    correct = _fold_eq(f, check_c, one_c)
    flipped = _fold_eq(f, check_c, neg_one_c)
    flipped_i = _fold_eq(f, check_c, neg_sqm1_c)
    r = jnp.where((flipped | flipped_i)[..., None, :], f.mul(r, sqrt_m1), r)
    r_c = _fold_canonicalize(f, r)
    r_neg_c = _fold_canonicalize(f, f.sub(jnp.zeros_like(r), r_c))
    r_abs = jnp.where((r_c[..., 0, :] & 1)[..., None, :] == 1, r_neg_c, r_c)
    return correct | flipped, r_abs


def _decompress_impl(consts, s):
    """s: (n, B) canonical limbs -> (ok (B,), X, Y, T canonical (n, B))."""
    import jax.numpy as jnp

    from .limbfold import FieldOps

    eng = edwards_engine()
    f = FieldOps(eng.n, consts)
    two_d = f.extra_const(0)
    sqrt_m1 = f.extra_const(1)

    ss = f.mul(s, s)
    one_b = jnp.broadcast_to(f.extra_const(3), ss.shape)
    u1 = f.sub(one_b, ss)
    u2 = f.add(one_b, ss)
    u2_sqr = f.mul(u2, u2)
    # Only 2d is shipped as a constant, so work with the doubled quantity
    # 2v = -(2d * u1^2) - 2*u2^2 and take SQRT_RATIO_M1 of
    # 4*v*u2^2 = (2v)*(2*u2^2): the extra factor 4 is a square, so
    # was_square agrees and the root is invsqrt/2 — recovered by doubling.
    u1_sq = f.mul(u1, u1)
    two_v = f.sub(
        jnp.zeros_like(u1_sq),
        f.add(f.mul(two_d, u1_sq), f.add(u2_sqr, u2_sqr)),
    )
    arg = f.mul(two_v, f.add(u2_sqr, u2_sqr))  # = 4 * v * u2^2
    was_square, invsqrt4 = _sqrt_ratio_1v(f, arg, sqrt_m1)
    # invsqrt = 2 * invsqrt4 up to sign; abs() is over the canonical
    # representative, so recompute it on the doubled value.
    invsqrt = f.add(invsqrt4, invsqrt4)
    iv_c = _fold_canonicalize(f, invsqrt)
    iv_neg = _fold_canonicalize(f, f.sub(jnp.zeros_like(invsqrt), iv_c))
    invsqrt = jnp.where((iv_c[..., 0, :] & 1)[..., None, :] == 1, iv_neg, iv_c)
    den_x = f.mul(invsqrt, u2)
    # den_y carries two_v = 2v, so y = u1 * den_y * (1/2) via the shipped
    # inv2 constant (no division).
    den_y = f.mul(f.mul(invsqrt, den_x), two_v)
    inv2 = f.extra_const(4)
    x_raw = f.mul(f.mul(f.add(s, s), den_x), one_b)
    x_c = _fold_canonicalize(f, x_raw)
    x_neg = _fold_canonicalize(f, f.sub(jnp.zeros_like(x_raw), x_c))
    x = jnp.where((x_c[..., 0, :] & 1)[..., None, :] == 1, x_neg, x_c)
    y = f.mul(f.mul(u1, den_y), inv2)
    t = f.mul(x, y)
    y_c = _fold_canonicalize(f, y)
    t_c = _fold_canonicalize(f, t)
    t_negative = (t_c[..., 0, :] & 1) == 1
    y_zero = jnp.all(y_c == 0, axis=-2)
    ok = was_square & (~t_negative) & (~y_zero)
    return ok, x, y_c, t_c


@backend_cached
def _decompress_jit(_backend, B: int):
    import jax

    if _interpret():
        return _decompress_impl
    return jax.jit(_decompress_impl)


@functools.lru_cache(maxsize=None)
def _compress_consts() -> np.ndarray:
    """Consts block for the encode/decode kernels: TWO_D, SQRT_M1,
    INVSQRT_A_MINUS_D, 1, 1/2 as extra rows."""
    from . import ed25519 as ed

    eng = edwards_engine()
    ctx = eng.ctx
    return ctx.consts_block(
        [
            ctx.encode_value(ed.TWO_D),
            ctx.encode_value(ed.SQRT_M1),
            ctx.encode_value(ed.INVSQRT_A_MINUS_D),
            ctx.encode_value(1),
            ctx.encode_value(pow(2, -1, ed.P)),
        ]
    )


def ristretto_decompress_device(encodings) -> List:
    """Batched RFC 9496 DECODE: list of 32-byte strings -> list of extended
    host points or None (invalid encoding), matching ops/ed25519.decompress
    lane-for-lane."""
    import jax.numpy as jnp

    from . import ed25519 as ed

    eng = edwards_engine()
    ctx = eng.ctx
    B = len(encodings)
    vals = []
    pre_ok = []
    for data in encodings:
        if len(data) != 32:
            pre_ok.append(False)
            vals.append(0)
            continue
        s = int.from_bytes(data, "little")
        pre_ok.append(s < ed.P and s % 2 == 0)
        vals.append(s % ed.P)
    s_np = ctx.encode_ints(vals)  # (B, n)
    s_arr = jnp.asarray(np.transpose(s_np, (1, 0)))  # (n, B)
    consts = jnp.asarray(_compress_consts())
    ok, x, y, t = _decompress_jit(B)(consts, s_arr)
    ok_np = np.asarray(ok)
    xs = eng.ctx.decode(np.transpose(np.asarray(x), (1, 0)))
    ys = eng.ctx.decode(np.transpose(np.asarray(y), (1, 0)))
    ts = eng.ctx.decode(np.transpose(np.asarray(t), (1, 0)))
    out = []
    for i in range(B):
        if not pre_ok[i] or not bool(ok_np[i]):
            out.append(None)
        else:
            out.append((int(xs[i]), int(ys[i]), 1, int(ts[i])))
    return out
