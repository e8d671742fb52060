"""Whole-pipeline ON-DEVICE bulletproofs range prover (batched, lockstep).

VERDICT r4 #2: the device MSM engine, Ristretto codec, mod-l scalar engine
and STROBE transcript now all exist on-chip; this module assembles them into
a prover that advances a whole batch of single range proofs through every
phase — commitments, Fiat–Shamir challenges, the t(x) algebra, and all six
inner-product rounds — with ZERO host round-trips per transcript operation:
host work is one upload of inputs/randomness and one download of the
finished 672-byte proofs.

Byte-identical schedule to models/bulletproofs.prove_single (itself pinned
to dalek's bulletproofs 5.0; reference consumption at
/root/reference/src/backend/bulletproofs.rs:112-178): same labels, same
append order, same never-materialize-generators IPP over the fixed basis
[B_blinding] + G + H + [B].

Differential-tested bit-exact against the host prover with injected
randomness (tests/test_bp_device.py).
"""

from __future__ import annotations

import functools
import os
from typing import List, Sequence, Tuple

import numpy as np

from ..ops import ed25519 as ed
from ..ops import scalar_device as sd
from ..ops.keccak_device import TranscriptDevice
from ..ops.limbfold import LIMB_BITS, FieldOps, backend_cached
from . import bp_generators as gens

L = ed.L
N_BITS = 64


# ---------------------------------------------------------------------------
# helpers on fold-limb arrays
# ---------------------------------------------------------------------------


def _canonical_scalar_rows(f: FieldOps, sc, x):
    """Relaxed mod-l limbs (..., n, B) -> canonical strict limbs (value < l).

    strict_digit_windows' representative (< 2^256, = x + k*l) is made
    canonical by subtracting the right multiple of l: k in {0..4} after the
    +4l bias, found by lexicographic sign tests against k*l.
    """
    import jax.numpy as jnp

    n = sc.n
    x = f.carry(f.carry(f.carry(x)))
    x = sd.fold252(f, sc, x)
    x = sd.fold252(f, sc, x)
    x = x + f.extra_const(sd.ScalarDeviceCtx.IDX_BIAS)  # +4l, value >= 0
    for _ in range(n + 2):
        x = f.carry(x)
    # x strict, value in (4l - 2^138, 4l + 2^252) subset [0, 6l)
    from ..ops.limbfold import int_to_limbs

    for k in (4, 3, 2, 1):  # greedy: subtract largest k*l that fits
        kl = jnp.asarray(int_to_limbs(k * L, n).astype(np.int32))[:, None]
        w = x - kl
        # leading-sign test: sign of the most-significant nonzero limb diff
        nz = (w != 0).astype(jnp.int32)
        # rank from top: first nonzero limb has cumsum (from top) == 1
        csum = jnp.cumsum(nz[::-1, :], axis=0)[::-1, :]
        lead = ((csum == 1) & (nz == 1)).astype(jnp.int32)
        sign = jnp.sum(lead * jnp.sign(w), axis=-2)  # (B,): +1, -1, or 0
        ge = sign >= 0
        x = jnp.where(ge[None, :], w, x)
        if k > 1:
            # re-strict after a subtract (borrows): value >= 0
            for _ in range(n + 1):
                x = f.carry(x)
    for _ in range(n + 1):
        x = f.carry(x)
    return x  # strict, < l


def _limbs_to_byte_rows(x, nbytes: int = 32):
    """Strict 12-bit limbs (n, B) -> (nbytes, B) uint32 byte rows (LE)."""
    import jax.numpy as jnp

    n = x.shape[-2]
    rows = []
    for j in range(nbytes):
        bit = 8 * j
        i, off = bit // LIMB_BITS, bit % LIMB_BITS
        if i >= n:
            rows.append(jnp.zeros_like(x[0]).astype(jnp.uint32))
            continue
        b = x[i, :] >> off
        take = LIMB_BITS - off
        if take < 8 and i + 1 < n:
            b = b | (x[i + 1, :] << take)
        rows.append((b & 0xFF).astype(jnp.uint32))
    return jnp.stack(rows, axis=0)


def _compress_to_bytes(pts):
    """(4, n, B) extended points -> (32, B) canonical encodings, on device."""
    from ..ops import curve_jax as cj

    s_limbs = cj._compress_impl(_compress_consts_j(), pts)  # (n, B) strict
    return _limbs_to_byte_rows(s_limbs, 32)


@functools.lru_cache(maxsize=None)
def _compress_consts_j():
    import jax.numpy as jnp

    from ..ops import curve_jax as cj

    return jnp.asarray(cj._compress_consts())


# ---------------------------------------------------------------------------
# fixed basis table: [B_blinding] + G + H + [B]
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=None)
def _basis_table(n_bits: int):
    from ..ops import curve_jax as cj

    B_base, B_blinding = gens.pedersen_gens()
    G, H = gens.bp_gens(n_bits)
    pts = [B_blinding] + list(G) + list(H) + [B_base]
    return cj.DeviceTable("ed25519", cj.edwards_engine().encode_points(pts),
                          host_points=pts), len(pts)


@backend_cached
def _msm_dw_jit(_backend, Kp: int, B: int):
    """v3 MSM driver entry taking device digit windows (NWIN, Kp, B)."""
    import jax
    import jax.numpy as jnp

    from ..ops import curve_jax as cj

    eng = cj.get_engine("ed25519")
    C, n = eng.coords, eng.n
    fused = cj._window_fused_call("ed25519", Kp, B)
    horner = cj._horner_call("ed25519", B)
    ident = np.broadcast_to(eng.identity_np()[..., None], (C, n, B))

    def run(consts, packedT, dw):
        def step(acc, dig):
            w = fused(consts, packedT, dig)
            return horner(consts, acc, w), None

        acc, _ = jax.lax.scan(step, jnp.asarray(ident), dw)
        return acc  # (C, n, B)

    return run if cj._interpret() else jax.jit(run)


def _pad_digit_windows(dw, Kp: int):
    """(32, K, B) device digits -> (32, Kp, B) (zero rows for padded basis)."""
    import jax.numpy as jnp

    K = dw.shape[1]
    if K == Kp:
        return dw
    return jnp.pad(dw, ((0, 0), (0, Kp - K), (0, 0)))


# ---------------------------------------------------------------------------
# jitted compute segments (everything between transcript phases runs as ONE
# XLA program — eager per-op dispatch over the tunnel costs ~ms each, which
# made the first working prover ~90 s/batch; segmented it is a handful of
# async dispatches)
# ---------------------------------------------------------------------------


@backend_cached
def _segs(_backend, Kp: int):
    import jax
    import jax.numpy as jnp

    sc = sd.get_scalar_ctx()
    nl = sc.n
    n = N_BITS
    consts_np = sc.consts_np
    one_np = sc.encode([1])[0]
    two_i_np = sc.encode([pow(2, i, L) for i in range(n)])  # (n, nl)

    def F():
        return sc.field(jnp.asarray(consts_np))

    def carry3(f, x):
        # 64-term relaxed sums can set the top limb, whose ONE-sized wrap
        # needs three passes to settle back under ~2^13 (round-5 bug)
        return f.carry(f.carry(f.carry(x)))

    def msm2_dw(f, val, blind):
        stacked = jnp.concatenate(
            [blind[None], jnp.zeros((2 * n,) + val.shape, val.dtype), val[None]],
            axis=0,
        )
        return _pad_digit_windows(sd.strict_digit_windows(f, sc, stacked), Kp)

    def pow_stack(f, base):
        """[base^0 .. base^(n-1)] as (n, nl, B) via log-depth doubling:
        6 batched muls instead of a 63-step sequential chain (these small
        muls are latency-bound on the device)."""
        one_col = jnp.asarray(one_np)[:, None]
        stack = jnp.stack(
            [jnp.broadcast_to(one_col, base.shape), base], axis=0
        )  # powers 0..1
        step_pow = base
        while stack.shape[0] < n:
            step_pow = f.mul(step_pow, step_pow) if stack.shape[0] > 2 else f.mul(base, base)
            stack = jnp.concatenate(
                [stack, f.mul(stack, step_pow[None])], axis=0
            )[:n]
        return stack

    def seg_setup(y_raw, z_raw, aL_d, sL_d, sR_d, t1b, t2b):
        f = F()
        y = sd.reduce_wide(f, sc, y_raw)
        z = sd.reduce_wide(f, sc, z_raw)
        z2 = f.mul(z, z)
        one_col = jnp.asarray(one_np)[:, None]
        y_pow = pow_stack(f, y)
        two_i = jnp.asarray(two_i_np)
        l0 = f.sub(aL_d, z[None])
        aR_z = f.sub(
            f.add(aL_d, z[None]),
            jnp.broadcast_to(one_col[None], aL_d.shape),
        )
        r0 = f.add(f.mul(y_pow, aR_z), f.mul(z2[None], two_i[:, :, None]))
        r1 = f.mul(y_pow, sR_d)
        t1_s = carry3(
            f, jnp.sum(f.mul(l0, r1), axis=0) + jnp.sum(f.mul(sL_d, r0), axis=0)
        )
        t2_s = carry3(f, jnp.sum(f.mul(sL_d, r1), axis=0))
        dwT1 = msm2_dw(f, t1_s, t1b)
        dwT2 = msm2_dw(f, t2_s, t2b)
        return y, z2, l0, r0, r1, dwT1, dwT2

    def seg_after_x(x_raw, l0, r0, r1, sL_d, z2, gamma_d, t1b, t2b, ab, sb):
        f = F()
        x = sd.reduce_wide(f, sc, x_raw)
        l_vec = f.add(l0, f.mul(sL_d, x[None]))
        r_vec = f.add(r0, f.mul(r1, x[None]))
        t_x = carry3(f, jnp.sum(f.mul(l_vec, r_vec), axis=0))
        x2 = f.mul(x, x)
        t_x_blind = f.add(
            f.mul(z2, gamma_d), f.add(f.mul(x, t1b), f.mul(x2, t2b))
        )
        e_blind = f.add(ab, f.mul(x, sb))
        tx_r = _limbs_to_byte_rows(_canonical_scalar_rows(f, sc, t_x))
        txb_r = _limbs_to_byte_rows(_canonical_scalar_rows(f, sc, t_x_blind))
        eb_r = _limbs_to_byte_rows(_canonical_scalar_rows(f, sc, e_blind))
        return l_vec, r_vec, tx_r, txb_r, eb_r

    def seg_hc(y_arr):
        f = F()
        y_inv = sd.inv_device(f, y_arr)
        one_col = jnp.asarray(one_np)[:, None]
        B = y_arr.shape[-1]
        gc = jnp.broadcast_to(one_col[None], (n, nl, B)).astype(jnp.int32) + 0
        return gc, pow_stack(f, y_inv)

    def seg_ipp_pre(w_arr, a_v, b_v, gc, hc):
        f = F()
        m = a_v.shape[0]
        half = m // 2
        reps = n // m
        B = a_v.shape[-1]
        a_lo, a_hi = a_v[:half], a_v[half:]
        b_lo, b_hi = b_v[:half], b_v[half:]
        cL = carry3(f, jnp.sum(f.mul(a_lo, b_hi), axis=0))
        cR = carry3(f, jnp.sum(f.mul(a_hi, b_lo), axis=0))
        gc_r = gc.reshape(reps, m, nl, B)
        hc_r = hc.reshape(reps, m, nl, B)
        zero_row = jnp.zeros((1, nl, B), jnp.int32)

        def scal(a_sel, b_sel, g_side, c):
            gl = jnp.zeros_like(gc_r)
            hl = jnp.zeros_like(hc_r)
            if g_side == "R":  # L point: a_lo vs G_R, b_hi vs H_L
                gl = gl.at[:, half:].set(
                    f.mul(jnp.broadcast_to(a_sel[None], (reps, half, nl, B)), gc_r[:, half:])
                )
                hl = hl.at[:, :half].set(
                    f.mul(jnp.broadcast_to(b_sel[None], (reps, half, nl, B)), hc_r[:, :half])
                )
            else:
                gl = gl.at[:, :half].set(
                    f.mul(jnp.broadcast_to(a_sel[None], (reps, half, nl, B)), gc_r[:, :half])
                )
                hl = hl.at[:, half:].set(
                    f.mul(jnp.broadcast_to(b_sel[None], (reps, half, nl, B)), hc_r[:, half:])
                )
            q = f.mul(c, w_arr)
            return jnp.concatenate(
                [zero_row, gl.reshape(n, nl, B), hl.reshape(n, nl, B), q[None]],
                axis=0,
            )

        dwL = _pad_digit_windows(
            sd.strict_digit_windows(f, sc, scal(a_lo, b_hi, "R", cL)), Kp
        )
        dwR = _pad_digit_windows(
            sd.strict_digit_windows(f, sc, scal(a_hi, b_lo, "L", cR)), Kp
        )
        return dwL, dwR

    def seg_ipp_post(u_raw, a_v, b_v, gc, hc):
        f = F()
        m = a_v.shape[0]
        half = m // 2
        reps = n // m
        B = a_v.shape[-1]
        u = sd.reduce_wide(f, sc, u_raw)
        u_inv = sd.inv_device(f, u)
        a_lo, a_hi = a_v[:half], a_v[half:]
        b_lo, b_hi = b_v[:half], b_v[half:]
        a2 = f.add(f.mul(a_lo, u[None]), f.mul(a_hi, u_inv[None]))
        b2 = f.add(f.mul(b_lo, u_inv[None]), f.mul(b_hi, u[None]))
        gc_r = gc.reshape(reps, m, nl, B)
        hc_r = hc.reshape(reps, m, nl, B)
        gc2 = jnp.concatenate(
            [f.mul(gc_r[:, :half], u_inv[None, None]),
             f.mul(gc_r[:, half:], u[None, None])], axis=1
        ).reshape(n, nl, B)
        hc2 = jnp.concatenate(
            [f.mul(hc_r[:, :half], u[None, None]),
             f.mul(hc_r[:, half:], u_inv[None, None])], axis=1
        ).reshape(n, nl, B)
        return a2, b2, gc2, hc2

    def seg_w(w_raw):
        f = F()
        return sd.reduce_wide(f, sc, w_raw)

    def seg_final(a0, b0):
        f = F()
        return (
            _limbs_to_byte_rows(_canonical_scalar_rows(f, sc, a0)),
            _limbs_to_byte_rows(_canonical_scalar_rows(f, sc, b0)),
        )

    from ..ops import curve_jax as cj

    def seg_compress(consts, pts):
        return _limbs_to_byte_rows(cj._compress_impl(consts, pts), 32)

    jit = (lambda fn: fn) if cj._interpret() else jax.jit
    return {
        "setup": jit(seg_setup),
        "after_x": jit(seg_after_x),
        "hc": jit(seg_hc),
        "ipp_pre": jit(seg_ipp_pre),
        "ipp_post": jit(seg_ipp_post),
        "w": jit(seg_w),
        "final": jit(seg_final),
        "compress": jit(seg_compress),
    }


# ---------------------------------------------------------------------------
# the batched prover
# ---------------------------------------------------------------------------


def prove_single_batch_device(
    label: bytes,
    values: Sequence[int],
    blindings: Sequence[int],
    rnd: Sequence[Sequence[int]] = None,
) -> List[Tuple[bytes, bytes]]:
    """Convenience wrapper: fresh per-lane transcripts under one label."""
    from .strobe import Transcript

    transcripts = [Transcript(label) for _ in values]
    insts = [
        (t, v, g, N_BITS) for t, v, g in zip(transcripts, values, blindings)
    ]
    return prove_insts_device(insts, rnd=rnd)


def prove_insts_device(
    insts, rand: bytes = None, rnd: Sequence[Sequence[int]] = None
) -> List[Tuple[bytes, bytes]]:
    """Batch of 64-bit single range proofs, whole pipeline on device.

    ``insts``: ``(transcript, value, blinding, n)`` like
    models/bulletproofs._prove_batch_fixed_n — transcripts resume on device
    (positions must agree across the batch: group by label length).
    ``rand``: the native prover's randomness layout ((2n+4) x 64-byte wide
    draws per lane); ``rnd``: pre-reduced per-lane scalar lists
    ``[a_blind, s_blind, t1_blind, t2_blind, s_L(64), s_R(64)]``.

    Returns [(proof_672_bytes, V_compressed)] per lane, byte-identical to
    models/bulletproofs.prove_single under the same randomness.
    """
    import jax.numpy as jnp

    from ..ops import curve_jax as cj

    B0 = len(insts)
    assert B0 > 0
    n = N_BITS
    assert all(i[3] == n for i in insts), "device prover is 64-bit only"
    # pad to the shared power-of-two buckets so arbitrary batch sizes reuse
    # the compiled programs; pad lanes clone lane 0 and are dropped on exit
    B = cj._pad_batch(B0)
    if B != B0:
        insts = list(insts) + [insts[0]] * (B - B0)
        if rnd is not None:
            rnd = list(rnd) + [rnd[0]] * (B - B0)
        if rand is not None:
            per0 = (2 * n + 4) * 64
            rand = rand + rand[:per0] * (B - B0)
    transcripts = [i[0] for i in insts]
    values = [i[1] for i in insts]
    blindings = [i[2] for i in insts]
    sc = sd.get_scalar_ctx()
    nl = sc.n
    table, K = _basis_table(n)
    Kp = table.Kp
    f = sc.field(jnp.asarray(sc.consts_np))

    # -- randomness --------------------------------------------------------
    if rnd is None:
        per = (2 * n + 4) * 64
        if rand is None:
            rand = os.urandom(per * B)
        assert len(rand) == per * B

        def wide(lane, slot):
            off = per * lane + 64 * slot
            return ed.scalar_from_bytes_mod_order_wide(rand[off : off + 64])

        rnd = [
            [wide(b, s) for s in range(2 * n + 4)] for b in range(B)
        ]
    a_blind = [r[0] for r in rnd]
    s_blind = [r[1] for r in rnd]
    s_L = [[r[2 + i] for r in rnd] for i in range(n)]  # (n)(B)
    s_R = [[r[2 + n + i] for r in rnd] for i in range(n)]
    t1_blind = [r[2 + 2 * n] for r in rnd]
    t2_blind = [r[3 + 2 * n] for r in rnd]

    # -- host-known MSMs: V, A, S (digits prepared on host) ---------------
    gamma = [b % L for b in blindings]
    aL = [[(v >> i) & 1 for v in values] for i in range(n)]  # (n)(B)
    # basis rows: 0 = B_blinding, 1..n = G, n+1..2n = H, 2n+1 = B
    v_scals = [
        [gamma[b], *(0 for _ in range(2 * n)), values[b] % L] for b in range(B)
    ]
    a_scals = [
        [a_blind[b]]
        + [aL[i][b] for i in range(n)]
        + [(aL[i][b] - 1) % L for i in range(n)]
        + [0]
        for b in range(B)
    ]
    s_scals = [
        [s_blind[b]]
        + [s_L[i][b] for i in range(n)]
        + [s_R[i][b] for i in range(n)]
        + [0]
        for b in range(B)
    ]
    Bp = cj._pad_batch(B)

    def host_msm(scals):
        digits = cj._digits_from_scalars(scals, K, Kp)
        if Bp != B:
            digits = np.pad(digits, ((0, Bp - B), (0, 0), (0, 0)))
        out = cj._msm_jit_v3("ed25519", Kp, Bp)(
            table.consts, table.table_int8_packed, jnp.asarray(digits)
        )
        return out[..., :B] if Bp != B else out  # (C, n_f, B)

    segs = _segs(Kp)
    consts_j = _compress_consts_j()
    V_pt = host_msm(v_scals)
    A_pt = host_msm(a_scals)
    S_pt = host_msm(s_scals)
    V_b = segs["compress"](consts_j, V_pt)
    A_b = segs["compress"](consts_j, A_pt)
    S_b = segs["compress"](consts_j, S_pt)

    # -- transcript to y, z (one jitted phase) -----------------------------
    t = TranscriptDevice.from_transcripts(transcripts)
    y_raw, z_raw = t.run_phase([
        ("msg", b"dom-sep", b"rangeproof v1"),
        ("msg", b"n", n.to_bytes(8, "little")),
        ("msg", b"m", (1).to_bytes(8, "little")),
        ("msg", b"V", V_b),
        ("msg", b"A", A_b),
        ("msg", b"S", S_b),
        ("chal", b"y", 64),
        ("chal", b"z", 64),
    ])

    enc1 = lambda vals: jnp.asarray(np.transpose(sc.encode(vals), (1, 0)))
    aL_d = jnp.asarray(
        np.stack(
            [np.transpose(sc.encode(aL[i]), (1, 0)) for i in range(n)], axis=0
        )
    )  # (n, nl, B)
    sL_d = jnp.asarray(
        np.stack([np.transpose(sc.encode(s_L[i]), (1, 0)) for i in range(n)], 0)
    )
    sR_d = jnp.asarray(
        np.stack([np.transpose(sc.encode(s_R[i]), (1, 0)) for i in range(n)], 0)
    )
    gamma_d = enc1(gamma)
    a_blind_d = enc1(a_blind)
    s_blind_d = enc1(s_blind)
    t1_blind_d = enc1(t1_blind)
    t2_blind_d = enc1(t2_blind)

    y, z2, l0, r0, r1, dwT1, dwT2 = segs["setup"](
        y_raw, z_raw, aL_d, sL_d, sR_d, t1_blind_d, t2_blind_d
    )

    # T1/T2 (and each round's L/R below) share the basis: run them as ONE
    # double-wide MSM batch + one compress — same compiled programs as a
    # 2B-lane prove, half the dispatches
    run = _msm_dw_jit(Kp, B)
    run2 = _msm_dw_jit(Kp, 2 * B)
    dwT = jnp.concatenate([dwT1, dwT2], axis=2)  # (32, Kp, 2B)
    Tb = segs["compress"](
        consts_j, run2(table.consts, table.table_int8_packed, dwT)
    )
    T1_b, T2_b = Tb[:, :B], Tb[:, B:]
    (x_raw,) = t.run_phase([
        ("msg", b"T_1", T1_b),
        ("msg", b"T_2", T2_b),
        ("chal", b"x", 64),
    ])

    l_vec, r_vec, tx_r, txb_r, eb_r = segs["after_x"](
        x_raw, l0, r0, r1, sL_d, z2, gamma_d, t1_blind_d, t2_blind_d,
        a_blind_d, s_blind_d,
    )
    (w_raw,) = t.run_phase([
        ("msg", b"t_x", tx_r),
        ("msg", b"t_x_blinding", txb_r),
        ("msg", b"e_blinding", eb_r),
        ("chal", b"w", 64),
        ("msg", b"dom-sep", b"ipp v1"),
        ("msg", b"n", n.to_bytes(8, "little")),
    ])
    w = segs["w"](w_raw)
    gc, hc = segs["hc"](y)

    a_v, b_v = l_vec, r_vec
    L_bytes: List = []
    R_bytes: List = []
    m = n
    while m > 1:
        dwL, dwR = segs["ipp_pre"](w, a_v, b_v, gc, hc)
        dwLR = jnp.concatenate([dwL, dwR], axis=2)
        LRb = segs["compress"](
            consts_j, run2(table.consts, table.table_int8_packed, dwLR)
        )
        Lb, Rb = LRb[:, :B], LRb[:, B:]
        L_bytes.append(Lb)
        R_bytes.append(Rb)
        (u_raw,) = t.run_phase([
            ("msg", b"L", Lb),
            ("msg", b"R", Rb),
            ("chal", b"u", 64),
        ])
        a_v, b_v, gc, hc = segs["ipp_post"](u_raw, a_v, b_v, gc, hc)
        m //= 2

    a_rows, b_rows = segs["final"](a_v[0], b_v[0])

    # -- assemble: (704, B) byte rows, one fetch ---------------------------
    rows = [A_b, S_b, T1_b, T2_b, tx_r, txb_r, eb_r]
    for Lb, Rb in zip(L_bytes, R_bytes):
        rows.append(Lb)
        rows.append(Rb)
    rows.append(a_rows)
    rows.append(b_rows)
    rows.append(V_b)
    blob = np.asarray(jnp.concatenate(rows, axis=0))  # (704, B)
    cols = np.ascontiguousarray(blob.astype(np.uint8).T)  # (B, 704)
    out = []
    for bidx in range(B0):  # drop pad lanes
        col = cols[bidx].tobytes()
        out.append((col[:672], col[672:704]))
    return out
