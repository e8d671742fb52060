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
from ..ops.limbfold import LIMB_BITS, FieldOps
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


@functools.lru_cache(maxsize=None)
def _msm_dw_jit(Kp: int, B: int):
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

    V_pt = host_msm(v_scals)
    A_pt = host_msm(a_scals)
    S_pt = host_msm(s_scals)
    V_b = _compress_to_bytes(V_pt)
    A_b = _compress_to_bytes(A_pt)
    S_b = _compress_to_bytes(S_pt)

    # -- transcript to y, z ------------------------------------------------
    t = TranscriptDevice.from_transcripts(transcripts)
    t.append_message(b"dom-sep", b"rangeproof v1")
    t.append_u64(b"n", n)
    t.append_u64(b"m", 1)
    t.append_message(b"V", V_b)
    t.append_message(b"A", A_b)
    t.append_message(b"S", S_b)
    y = sd.reduce_wide(f, sc, t.challenge_bytes(b"y", 64))  # (nl, B)
    z = sd.reduce_wide(f, sc, t.challenge_bytes(b"z", 64))
    z2 = f.mul(z, z)

    enc1 = lambda vals: jnp.asarray(np.transpose(sc.encode(vals), (1, 0)))

    aL_d = jnp.stack([enc1(aL[i]) for i in range(n)], axis=0)  # (n, nl, B)
    sL_d = jnp.stack([enc1(s_L[i]) for i in range(n)], axis=0)
    sR_d = jnp.stack([enc1(s_R[i]) for i in range(n)], axis=0)
    gamma_d = enc1(gamma)
    a_blind_d = enc1(a_blind)
    s_blind_d = enc1(s_blind)
    t1_blind_d = enc1(t1_blind)
    t2_blind_d = enc1(t2_blind)

    # y^i powers, 2^i constants
    y_pows = [jnp.broadcast_to(jnp.asarray(sc.encode([1])[0])[:, None], z.shape)]
    for _ in range(1, n):
        y_pows.append(f.mul(y_pows[-1], y))
    y_pow = jnp.stack(y_pows, axis=0)  # (n, nl, B)
    two_i = jnp.asarray(sc.encode([pow(2, i, L) for i in range(n)]))  # (n, nl)

    l0 = f.sub(aL_d, z[None])  # (n, nl, B)
    aR_z = f.sub(f.add(aL_d, z[None]), jnp.broadcast_to(
        jnp.asarray(sc.encode([1])[0])[None, :, None], aL_d.shape))
    r0 = f.add(f.mul(y_pow, aR_z), f.mul(z2[None], two_i[:, :, None]))
    r1 = f.mul(y_pow, sR_d)

    def inner(a, b):
        import jax

        prods = f.mul(a, b)  # (n, nl, B)
        return jax.numpy.sum(prods, axis=0) * 1  # plain add is fine pre-carry?

    def carry3(x):
        # products are relaxed; a 64-term sum reaches ~2^19 per limb and can
        # set the TOP limb, whose wrap spreads ~ONE-sized limbs — one pass
        # leaves ~2^18 limbs and the next mul's conv overflows int32
        # (the round-5 lane-divergence bug). Three passes restore <= ~2^13.
        return f.carry(f.carry(f.carry(x)))

    t1_s = carry3(jnp.sum(f.mul(l0, r1), axis=0) + jnp.sum(f.mul(sL_d, r0), axis=0))
    t2_s = carry3(jnp.sum(f.mul(sL_d, r1), axis=0))

    # -- T1, T2 (device scalars) ------------------------------------------
    def device_msm_2(sc_val, sc_blind):
        # scalars: row 0 (B_blinding) = blind, row 2n+1 (B) = value
        zeros = jnp.zeros((1,) + sc_val.shape, dtype=sc_val.dtype)
        stacked = jnp.concatenate(
            [sc_blind[None], jnp.zeros((2 * n,) + sc_val.shape, sc_val.dtype),
             sc_val[None]], axis=0
        )  # (K, nl, B)
        dw = sd.strict_digit_windows(f, sc, stacked)  # (32, K, B)
        dw = _pad_digit_windows(dw, Kp)
        return _msm_dw_jit(Kp, B)(table.consts, table.table_int8_packed, dw)

    T1_b = _compress_to_bytes(device_msm_2(t1_s, t1_blind_d))
    T2_b = _compress_to_bytes(device_msm_2(t2_s, t2_blind_d))
    t.append_message(b"T_1", T1_b)
    t.append_message(b"T_2", T2_b)
    x = sd.reduce_wide(f, sc, t.challenge_bytes(b"x", 64))

    l_vec = f.add(l0, f.mul(sL_d, x[None]))  # (n, nl, B)
    r_vec = f.add(r0, f.mul(r1, x[None]))
    t_x = carry3(jnp.sum(f.mul(l_vec, r_vec), axis=0))
    x2 = f.mul(x, x)
    t_x_blind = f.add(
        f.mul(z2, gamma_d),
        f.add(f.mul(x, t1_blind_d), f.mul(x2, t2_blind_d)),
    )
    e_blind = f.add(a_blind_d, f.mul(x, s_blind_d))

    tx_c = _canonical_scalar_rows(f, sc, t_x)
    txb_c = _canonical_scalar_rows(f, sc, t_x_blind)
    eb_c = _canonical_scalar_rows(f, sc, e_blind)
    t.append_message(b"t_x", _limbs_to_byte_rows(tx_c))
    t.append_message(b"t_x_blinding", _limbs_to_byte_rows(txb_c))
    t.append_message(b"e_blinding", _limbs_to_byte_rows(eb_c))
    w = sd.reduce_wide(f, sc, t.challenge_bytes(b"w", 64))

    # -- IPP ---------------------------------------------------------------
    t.append_message(b"dom-sep", b"ipp v1")
    t.append_u64(b"n", n)

    y_inv = sd.inv_device(f, y)
    h_factors = [y_pows[0]]
    for _ in range(1, n):
        h_factors.append(f.mul(h_factors[-1], y_inv))
    gc = jnp.broadcast_to(
        jnp.asarray(sc.encode([1])[0])[None, :, None], (n, nl, B)
    ).astype(jnp.int32) * 1
    hc = jnp.stack(h_factors, axis=0)  # (n, nl, B)

    a_v = l_vec
    b_v = r_vec
    L_bytes: List = []
    R_bytes: List = []
    m = n
    while m > 1:
        half = m // 2
        reps = n // m
        a_lo, a_hi = a_v[:half], a_v[half:]
        b_lo, b_hi = b_v[:half], b_v[half:]
        cL = carry3(jnp.sum(f.mul(a_lo, b_hi), axis=0))
        cR = carry3(jnp.sum(f.mul(a_hi, b_lo), axis=0))
        gc_r = gc.reshape(reps, m, nl, B)
        hc_r = hc.reshape(reps, m, nl, B)
        # L: a_lo against G_R block, b_hi against H_L block
        gl = jnp.zeros_like(gc_r)
        gl = gl.at[:, half:].set(f.mul(jnp.broadcast_to(a_lo[None], (reps, half, nl, B)), gc_r[:, half:]))
        hl = jnp.zeros_like(hc_r)
        hl = hl.at[:, :half].set(f.mul(jnp.broadcast_to(b_hi[None], (reps, half, nl, B)), hc_r[:, :half]))
        qL = f.mul(cL, w)
        zero_row = jnp.zeros((1, nl, B), jnp.int32)
        scal_L = jnp.concatenate(
            [zero_row, gl.reshape(n, nl, B), hl.reshape(n, nl, B), qL[None]],
            axis=0,
        )  # (K, nl, B)
        # R: a_hi against G_L, b_lo against H_R
        gr = jnp.zeros_like(gc_r)
        gr = gr.at[:, :half].set(f.mul(jnp.broadcast_to(a_hi[None], (reps, half, nl, B)), gc_r[:, :half]))
        hr = jnp.zeros_like(hc_r)
        hr = hr.at[:, half:].set(f.mul(jnp.broadcast_to(b_lo[None], (reps, half, nl, B)), hc_r[:, half:]))
        qR = f.mul(cR, w)
        scal_R = jnp.concatenate(
            [zero_row, gr.reshape(n, nl, B), hr.reshape(n, nl, B), qR[None]],
            axis=0,
        )
        dwL = _pad_digit_windows(sd.strict_digit_windows(f, sc, scal_L), Kp)
        dwR = _pad_digit_windows(sd.strict_digit_windows(f, sc, scal_R), Kp)
        run = _msm_dw_jit(Kp, B)
        Lb = _compress_to_bytes(run(table.consts, table.table_int8_packed, dwL))
        Rb = _compress_to_bytes(run(table.consts, table.table_int8_packed, dwR))
        L_bytes.append(Lb)
        R_bytes.append(Rb)
        t.append_message(b"L", Lb)
        t.append_message(b"R", Rb)
        u = sd.reduce_wide(f, sc, t.challenge_bytes(b"u", 64))
        u_inv = sd.inv_device(f, u)
        a_v = f.add(f.mul(a_lo, u[None]), f.mul(a_hi, u_inv[None]))
        b_v = f.add(f.mul(b_lo, u_inv[None]), f.mul(b_hi, u[None]))
        gc_new = jnp.concatenate(
            [f.mul(gc_r[:, :half], u_inv[None, None]),
             f.mul(gc_r[:, half:], u[None, None])], axis=1
        )
        hc_new = jnp.concatenate(
            [f.mul(hc_r[:, :half], u[None, None]),
             f.mul(hc_r[:, half:], u_inv[None, None])], axis=1
        )
        gc = gc_new.reshape(n, nl, B)
        hc = hc_new.reshape(n, nl, B)
        m = half

    a_fin = _canonical_scalar_rows(f, sc, a_v[0])
    b_fin = _canonical_scalar_rows(f, sc, b_v[0])

    # -- assemble: (704, B) byte rows, one fetch ---------------------------
    rows = [A_b, S_b, T1_b, T2_b,
            _limbs_to_byte_rows(tx_c), _limbs_to_byte_rows(txb_c),
            _limbs_to_byte_rows(eb_c)]
    for Lb, Rb in zip(L_bytes, R_bytes):
        rows.append(Lb)
        rows.append(Rb)
    rows.append(_limbs_to_byte_rows(a_fin))
    rows.append(_limbs_to_byte_rows(b_fin))
    rows.append(V_b)
    blob = np.asarray(jnp.concatenate(rows, axis=0))  # (704, B)
    out = []
    for bidx in range(B0):  # drop pad lanes
        col = bytes(int(v) & 0xFF for v in blob[:, bidx])
        out.append((col[:672], col[672:704]))
    return out
