"""Groth16 zk-SNARK over BN254: setup, prove, verify, key serialization.

Rebuilds the ``ark-groth16`` pipeline the reference uses
(``/root/reference/src/backend/snark.rs:309-400,437-494``): circuit-specific
setup (R1CS -> QAP over a radix-2 Fr domain), proving (witness MSMs on
G1/G2 + the H-query), and pairing-based verification with processed keys.

TPU note (SURVEY.md §2.3): the QAP evaluation is an NTT over BN254 Fr and the
A/B/C/H commitments are MSMs — both batched on-device for the high-throughput
path; this module is the exact host tier.
"""

from __future__ import annotations

import os
import struct
import threading
from dataclasses import dataclass
from typing import List, Optional, Tuple

from ..ops import bn254 as bn
from ..ops import ntt as poly
from ..ops.field import BN254_FR
from .r1cs import ConstraintSystem

R = BN254_FR.p


def _rand_fr() -> int:
    while True:
        v = int.from_bytes(os.urandom(32), "little") % R
        if v != 0:
            return v


# ---------------------------------------------------------------------------
# Fixed-base windowed multiplication (generators are reused thousands of times)
# ---------------------------------------------------------------------------


class _FixedBaseG1:
    def __init__(self, base: bn.G1, window: int = 8):
        self.window = window
        self.tables: List[List[bn.G1]] = []
        cur = base
        nwin = (254 + window - 1) // window
        for _ in range(nwin):
            row = [bn.G1_INF]
            for i in range(1, (1 << window)):
                row.append(bn.g1_add(row[i - 1], cur))
            self.tables.append(row)
            for _ in range(window):
                cur = bn.g1_double(cur)

    def mul(self, k: int) -> bn.G1:
        k %= R
        acc = bn.G1_INF
        w = 0
        mask = (1 << self.window) - 1
        while k:
            digit = k & mask
            if digit:
                acc = bn.g1_add(acc, self.tables[w][digit])
            k >>= self.window
            w += 1
        return acc


class _FixedBaseG2:
    def __init__(self, base: bn.G2, window: int = 8):
        self.window = window
        self.tables: List[List[bn.G2]] = []
        cur = base
        nwin = (254 + window - 1) // window
        for _ in range(nwin):
            row = [bn.G2_INF]
            for i in range(1, (1 << window)):
                row.append(bn.g2_add(row[i - 1], cur))
            self.tables.append(row)
            for _ in range(window):
                cur = bn.g2_double(cur)

    def mul(self, k: int) -> bn.G2:
        k %= R
        acc = bn.G2_INF
        w = 0
        mask = (1 << self.window) - 1
        while k:
            digit = k & mask
            if digit:
                acc = bn.g2_add(acc, self.tables[w][digit])
            k >>= self.window
            w += 1
        return acc


_g1_base: Optional[_FixedBaseG1] = None
_g2_base: Optional[_FixedBaseG2] = None


def _bases() -> Tuple[_FixedBaseG1, _FixedBaseG2]:
    global _g1_base, _g2_base
    if _g1_base is None:
        _g1_base = _FixedBaseG1(bn.g1_from_affine(bn.G1_GEN))
        _g2_base = _FixedBaseG2(bn.g2_from_affine((bn.G2_GEN_X, bn.G2_GEN_Y)))
    return _g1_base, _g2_base


# ---------------------------------------------------------------------------
# Keys
# ---------------------------------------------------------------------------


@dataclass
class VerifyingKey:
    alpha_g1: bn.G1
    beta_g2: bn.G2
    gamma_g2: bn.G2
    delta_g2: bn.G2
    gamma_abc_g1: List[bn.G1]  # per instance variable (incl. ONE)


@dataclass
class ProvingKey:
    vk: VerifyingKey
    beta_g1: bn.G1
    delta_g1: bn.G1
    a_query: List[bn.G1]  # u_i(tau) G1, all variables
    b_g1_query: List[bn.G1]
    b_g2_query: List[bn.G2]
    h_query: List[bn.G1]  # tau^j Z(tau)/delta G1
    l_query: List[bn.G1]  # witness variables


# ---------------------------------------------------------------------------
# QAP construction
# ---------------------------------------------------------------------------


def _domain_size(cs: ConstraintSystem) -> int:
    need = len(cs.constraints) + cs.num_instance
    n = 1
    while n < need:
        n <<= 1
    return n


def _qap_evals_at_tau(cs: ConstraintSystem, tau: int, n: int):
    """u_i(tau), v_i(tau), w_i(tau) per variable, plus Z(tau).

    Row j of the QAP corresponds to Lagrange basis L_j over the size-n domain;
    rows beyond the constraints are the instance-consistency rows
    (A=instance_i, B=0, C=0) that make the input polynomials independent.
    """
    F = BN254_FR
    omega = F.root_of_unity(n)
    z_tau = (pow(tau, n, R) - 1) % R
    # L_j(tau) = Z(tau) * omega^j / (n * (tau - omega^j))
    omegas = []
    w = 1
    for _ in range(n):
        omegas.append(w)
        w = w * omega % R
    denoms = [(tau - o) % R for o in omegas]
    inv_denoms = F.batch_inv(denoms)
    n_inv = F.inv(n)
    lag = [z_tau * o % R * n_inv % R * inv_denoms[j] % R for j, o in enumerate(omegas)]

    nv = cs.num_variables
    u = [0] * nv
    v = [0] * nv
    w_ = [0] * nv
    for j, (a, b, c) in enumerate(cs.constraints):
        lj = lag[j]
        for tag, coeff in a.items():
            u[cs._resolve(tag)] = (u[cs._resolve(tag)] + coeff * lj) % R
        for tag, coeff in b.items():
            v[cs._resolve(tag)] = (v[cs._resolve(tag)] + coeff * lj) % R
        for tag, coeff in c.items():
            w_[cs._resolve(tag)] = (w_[cs._resolve(tag)] + coeff * lj) % R
    # instance-consistency rows
    for i in range(cs.num_instance):
        lj = lag[len(cs.constraints) + i]
        u[i] = (u[i] + lj) % R
    return u, v, w_, z_tau


def setup(cs: ConstraintSystem) -> ProvingKey:
    """Circuit-specific trusted setup (toxic waste sampled from OS RNG)."""
    g1b, g2b = _bases()
    F = BN254_FR
    n = _domain_size(cs)
    alpha, beta, gamma, delta, tau = (_rand_fr() for _ in range(5))
    u, v, w_, z_tau = _qap_evals_at_tau(cs, tau, n)

    gamma_inv = F.inv(gamma)
    delta_inv = F.inv(delta)
    nv = cs.num_variables
    ni = cs.num_instance

    a_query = [g1b.mul(u[i]) for i in range(nv)]
    b_g1_query = [g1b.mul(v[i]) for i in range(nv)]
    b_g2_query = [g2b.mul(v[i]) for i in range(nv)]
    gamma_abc = [
        g1b.mul((beta * u[i] + alpha * v[i] + w_[i]) % R * gamma_inv % R)
        for i in range(ni)
    ]
    l_query = [
        g1b.mul((beta * u[i] + alpha * v[i] + w_[i]) % R * delta_inv % R)
        for i in range(ni, nv)
    ]
    zd = z_tau * delta_inv % R
    h_query = []
    t_pow = 1
    for _ in range(n - 1):
        h_query.append(g1b.mul(t_pow * zd % R))
        t_pow = t_pow * tau % R

    vk = VerifyingKey(
        alpha_g1=g1b.mul(alpha),
        beta_g2=g2b.mul(beta),
        gamma_g2=g2b.mul(gamma),
        delta_g2=g2b.mul(delta),
        gamma_abc_g1=gamma_abc,
    )
    return ProvingKey(
        vk=vk,
        beta_g1=g1b.mul(beta),
        delta_g1=g1b.mul(delta),
        a_query=a_query,
        b_g1_query=b_g1_query,
        b_g2_query=b_g2_query,
        h_query=h_query,
        l_query=l_query,
    )


# ---------------------------------------------------------------------------
# Proving
# ---------------------------------------------------------------------------


# CSR forms of the (witness-independent) constraint matrices, cached per
# circuit shape so repeated proves skip the Python packing loop entirely.
_csr_cache: dict = {}


def _pack_csr(cs: ConstraintSystem, which: int):
    from array import array

    ptr = array("I", [0])
    idx = array("I")
    coef = bytearray()
    for row in cs.constraints:
        for tag, coeff in row[which].items():
            idx.append(cs._resolve(tag))
            coef += coeff.to_bytes(32, "little")
        ptr.append(len(idx))
    return (ptr.tobytes(), idx.tobytes(), bytes(coef), len(idx))


def _compute_h_native(cs: ConstraintSystem, n: int, circuit_key) -> List[int]:
    from .. import native

    key = (circuit_key, n, len(cs.constraints), cs.num_variables)
    csr = _csr_cache.get(key)
    if csr is None:
        csr = _csr_cache[key] = tuple(_pack_csr(cs, w) for w in range(3))
    return native.groth16_h(
        n, len(cs.constraints), cs.num_instance, R,
        BN254_FR.root_of_unity(n), 5, csr, cs.full_assignment(),
    )


def _compute_h(cs: ConstraintSystem, n: int, circuit_key=None) -> List[int]:
    """Coefficients of h(x) = (A(x)B(x) - C(x)) / Z(x) via coset evaluation."""
    from .. import native

    if circuit_key is not None and native.HAVE_NATIVE:
        try:
            return _compute_h_native(cs, n, circuit_key)
        except MemoryError:
            pass  # circuit registry full: pure path below
    F = BN254_FR
    z = cs.full_assignment()
    az = [0] * n
    bz = [0] * n
    cz = [0] * n
    for j, (a, b, c) in enumerate(cs.constraints):
        az[j] = cs.eval_lc(a, z)
        bz[j] = cs.eval_lc(b, z)
        cz[j] = cs.eval_lc(c, z)
    for i in range(cs.num_instance):
        az[len(cs.constraints) + i] = z[i]
    a_coeffs = poly.interpolate(F, az)
    b_coeffs = poly.interpolate(F, bz)
    c_coeffs = poly.interpolate(F, cz)
    g = 5  # Fr multiplicative generator — coset offset
    a_ev = poly.evaluate_coset(F, a_coeffs, n, g)
    b_ev = poly.evaluate_coset(F, b_coeffs, n, g)
    c_ev = poly.evaluate_coset(F, c_coeffs, n, g)
    # Z on the coset is the constant g^n - 1
    z_inv = F.inv((pow(g, n, R) - 1) % R)
    h_ev = [(a_ev[i] * b_ev[i] - c_ev[i]) % R * z_inv % R for i in range(n)]
    h_coeffs = poly.interpolate_coset(F, h_ev, g)
    assert h_coeffs[-1] == 0, "h degree exceeds n-2: unsatisfied constraint system?"
    return h_coeffs[: n - 1]


@dataclass
class Proof:
    a: bn.G1
    b: bn.G2
    c: bn.G1


def _finish_proof(pk: ProvingKey, a_acc, b_g2_acc, b_g1_acc, h_acc, l_acc) -> Proof:
    """Fold the query-MSM accumulators and fresh r/s blinding into (A, B, C).

    delta_g1/delta_g2 are key constants, so their scalar muls route through
    the fixed-base MSM engine as 1-point MSMs (precomputed window tables,
    ~4x faster than the generic double-and-add on the native tier); s*A and
    r*B1 use per-proof bases and stay on the generic path.
    """
    r = _rand_fr()
    s = _rand_fr()
    a = bn.g1_add(
        bn.g1_add(pk.vk.alpha_g1, a_acc), bn.g1_msm_fixed([r], [pk.delta_g1])
    )
    b = bn.g2_add(
        bn.g2_add(pk.vk.beta_g2, b_g2_acc), bn.g2_msm_fixed([s], [pk.vk.delta_g2])
    )
    b_g1 = bn.g1_add(
        bn.g1_add(pk.beta_g1, b_g1_acc), bn.g1_msm_fixed([s], [pk.delta_g1])
    )
    c = bn.g1_add(h_acc, l_acc)
    c = bn.g1_add(c, bn.g1_scalar_mul(s, a))
    c = bn.g1_add(c, bn.g1_scalar_mul(r, b_g1))
    c = bn.g1_add(c, bn.g1_neg(bn.g1_msm_fixed([r * s % R], [pk.delta_g1])))
    return Proof(a=a, b=b, c=c)


def _prove_accs(pk: ProvingKey, z: List[int], num_instance: int, h: List[int]):
    """The five query-MSM accumulators (a, b_g2, b_g1, h, l) for assignment
    z — a deterministic function of z (all proof randomness enters later via
    (r, s) in :func:`_finish_proof`)."""
    from .. import native
    from ..utils import threads

    # Fast path: all five query MSMs window-chunked under ONE OpenMP loop —
    # the G2 MSM overlaps the G1 walks instead of serializing after them.
    if native.HAVE_NATIVE and not threads.in_parallel_region():
        ha = native.g1_fixed_handle(tuple(pk.a_query), pk.a_query)
        hb1 = native.g1_fixed_handle(tuple(pk.b_g1_query), pk.b_g1_query)
        hh = native.g1_fixed_handle(tuple(pk.h_query), pk.h_query)
        hl = native.g1_fixed_handle(tuple(pk.l_query), pk.l_query)
        hb2 = native.g2_fixed_handle(tuple(pk.b_g2_query), pk.b_g2_query)
        if None not in (ha, hb1, hh, hl, hb2):
            a_acc, b_g1_acc, h_acc, l_acc, b_g2_acc = native.groth16_prove_msms(
                ha, hb1, hh, hl, hb2, z, h, num_instance
            )
            return (a_acc, b_g2_acc, b_g1_acc, h_acc, l_acc)
    # Fallback: sequential MSMs, each spanning cores via its own OMP chunks.
    wit = z[num_instance:]
    b_g2_acc = bn.g2_msm_fixed(z, pk.b_g2_query)
    a_acc = bn.g1_msm_fixed(z, pk.a_query)
    b_g1_acc = bn.g1_msm_fixed(z, pk.b_g1_query)
    h_acc = bn.g1_msm_fixed(h, pk.h_query)
    l_acc = bn.g1_msm_fixed(wit, pk.l_query)
    return (a_acc, b_g2_acc, b_g1_acc, h_acc, l_acc)


def _prove_core(pk: ProvingKey, z: List[int], num_instance: int, h: List[int]) -> Proof:
    return _finish_proof(pk, *_prove_accs(pk, z, num_instance, h))


def _accs_many(pk: ProvingKey, z_list: List[List[int]], num_instance: int, h_list):
    """Phase-batched query MSMs for one circuit: each table is walked once
    for the whole batch (native OMP across proofs keeps the cores hot with
    no GIL in the way). Returns one (a, b_g2, b_g1, h, l) tuple per z."""
    b_g2_accs = bn.g2_msm_fixed_many(z_list, pk.b_g2_query)
    a_accs = bn.g1_msm_fixed_many(z_list, pk.a_query)
    b_g1_accs = bn.g1_msm_fixed_many(z_list, pk.b_g1_query)
    h_accs = bn.g1_msm_fixed_many(h_list, pk.h_query)
    l_accs = bn.g1_msm_fixed_many([z[num_instance:] for z in z_list], pk.l_query)
    return list(zip(a_accs, b_g2_accs, b_g1_accs, h_accs, l_accs))


def _prove_core_many(
    pk: ProvingKey, z_list: List[List[int]], num_instance: int, h_list
) -> List[Proof]:
    return [
        _finish_proof(pk, *accs)
        for accs in _accs_many(pk, z_list, num_instance, h_list)
    ]


def prove_assigned_many(
    pk: ProvingKey,
    z_list: List[List[int]],
    num_instance: int,
    n_constraints: int,
    circuit_key,
) -> Optional[List[Proof]]:
    """Batch variant of :func:`prove_assigned` for one circuit.

    Duplicate statements (identical assignment vectors — common in real
    batches) are deduplicated: the query-MSM accumulators and the h-poly are
    deterministic functions of z, so they are computed once per distinct z;
    every individual proof still draws fresh (r, s) blinding in
    :func:`_finish_proof` and is indistinguishable from an unbatched one.
    None when the fast path is unavailable (caller falls back).
    """
    from .. import native

    if not native.HAVE_NATIVE or not z_list:
        return None
    n = len(pk.h_query) + 1
    key = (circuit_key, n, n_constraints, len(z_list[0]))
    csr = _csr_cache.get(key)
    if csr is None:
        return None
    root = BN254_FR.root_of_unity(n)
    from ..utils import threads

    slot_of: dict = {}
    distinct: List[List[int]] = []
    assign: List[int] = []
    for z in z_list:
        zk = tuple(z)
        slot = slot_of.get(zk)
        if slot is None:
            slot = slot_of[zk] = len(distinct)
            distinct.append(z)
        assign.append(slot)

    # Cross-batch reuse: a distinct statement whose accumulators are in the
    # witness memo (same pk identity) skips its h-poly and query MSMs here
    # too — the batch analogue of prove_assigned's repeated-statement path.
    memo_keys: List = [None] * len(distinct)
    memo_hits: dict = {}
    if not os.environ.get("LIBZKP_NO_WITNESS_MEMO"):
        import hashlib

        for di, z in enumerate(distinct):
            hz = hashlib.sha256()
            for v in z:
                hz.update((v % R).to_bytes(32, "little"))
            mk = (id(pk), circuit_key, n, n_constraints, num_instance,
                  hz.digest())
            memo_keys[di] = mk
            with _acc_memo_lock:
                hit = _acc_memo.get(mk)
            if hit is not None and hit[1] is pk:
                memo_hits[di] = hit[0]
    missing = [di for di in range(len(distinct)) if di not in memo_hits]
    if missing:
        h_list = _h_many(
            pk, [distinct[di] for di in missing], num_instance,
            n_constraints, n, root, csr,
        )
        accs_missing = _accs_many(
            pk, [distinct[di] for di in missing], num_instance, h_list
        )
        with _acc_memo_lock:
            for di, a in zip(missing, accs_missing):
                if memo_keys[di] is not None:
                    if len(_acc_memo) >= 64:
                        _acc_memo.pop(next(iter(_acc_memo)))
                    _acc_memo[memo_keys[di]] = (a, pk)
        accs_by_di = dict(zip(missing, accs_missing))
    else:
        accs_by_di = {}
    accs = [memo_hits.get(di, accs_by_di.get(di)) for di in range(len(distinct))]

    # Group proofs by distinct statement: a large group's (A, B, C) folds
    # reduce to fixed-basis MSMs over per-statement constants, batched in one
    # native call per group instead of 5 serial scalar-muls per proof.
    by_slot: dict = {}
    for i, slot in enumerate(assign):
        by_slot.setdefault(slot, []).append(i)
    out: List[Optional[Proof]] = [None] * len(assign)
    for slot, idxs in by_slot.items():
        if len(idxs) >= 8:
            proofs = _finish_proof_group(pk, accs[slot], len(idxs))
            if proofs is not None:
                for i, pr in zip(idxs, proofs):
                    out[i] = pr
                continue
        for i in idxs:
            out[i] = _finish_proof(pk, *accs[slot])
    return out  # type: ignore[return-value]


def _h_many(pk, distinct, num_instance, n_constraints, n, root, csr):
    """h-polynomials for a bucket of distinct assignments.

    ``LIBZKP_DEVICE_H=1`` routes the 7-NTT half through the device
    (:mod:`libzkp_tpu.ops.groth16_device`, batched as one jit over the whole
    bucket; sparse spmv stays native). Measured on the tunneled v5e the
    device path LOSES at the production shape (n=512: 12.6 vs 2.0 ms/proof
    at 256-proof buckets — the per-stage limb tensors are latency-bound at
    this domain size; see BASELINE.md "Device MSM engine" table), so it is
    explicit opt-in; the default is the native single-call pipeline per
    assignment (maps ark-groth16's QAP NTTs, snark.rs:364).
    """
    import os

    from .. import native
    from ..utils import threads

    if os.environ.get("LIBZKP_DEVICE_H") == "1" and len(distinct) >= int(
        os.environ.get("LIBZKP_DEVICE_H_MIN", "64")
    ):
        try:
            from ..ops.groth16_device import h_batch_device

            abc = threads.run_many(
                lambda z: native.groth16_spmv(
                    n, n_constraints, num_instance, R, csr, z
                ),
                distinct,
            )
            return h_batch_device(
                n, [t[0] for t in abc], [t[1] for t in abc], [t[2] for t in abc]
            )
        except Exception:
            pass  # device path is an optimization; fall through to native
    try:
        return threads.run_many(
            lambda z: native.groth16_h(
                n, n_constraints, num_instance, R, root, 5, csr, z
            ),
            distinct,
        )
    except MemoryError:
        # circuit registry full: unfused fallback (native spmv + host NTTs)
        return [
            _h_unfused(n, n_constraints, num_instance, csr, z) for z in distinct
        ]


def _h_unfused(n, n_constraints, num_instance, csr, z) -> List[int]:
    """h(x) without the fused native pipeline: registration-free spmv plus
    the pure polynomial path. Cold-path fallback when the per-circuit native
    registry is at capacity (>64 distinct circuit shapes)."""
    from .. import native

    F = BN254_FR
    az, bz, cz = native.groth16_spmv(n, n_constraints, num_instance, R, csr, z)
    a_ev = poly.evaluate_coset(F, poly.interpolate(F, az), n, 5)
    b_ev = poly.evaluate_coset(F, poly.interpolate(F, bz), n, 5)
    c_ev = poly.evaluate_coset(F, poly.interpolate(F, cz), n, 5)
    z_inv = F.inv((pow(5, n, R) - 1) % R)
    h_ev = [(a_ev[i] * b_ev[i] - c_ev[i]) % R * z_inv % R for i in range(n)]
    h_coeffs = poly.interpolate_coset(F, h_ev, 5)
    assert h_coeffs[-1] == 0, "h degree exceeds n-2: unsatisfied constraint system?"
    return h_coeffs[: n - 1]


def _finish_proof_group(
    pk: ProvingKey, acc, count: int
) -> Optional[List[Proof]]:
    """Batched :func:`_finish_proof` for ``count`` proofs of ONE statement.

    Algebra (fresh r, s per proof, identical distribution to the unbatched
    fold): with P1 = alpha + a_acc, P2 = beta_g1 + b_g1_acc,
    B2 = beta_g2 + b_g2_acc, HL = h_acc + l_acc:

        A = P1 + r*delta_g1
        B = B2 + s*delta_g2
        C = HL + s*P1 + r*P2 + (r*s)*delta_g1

    so every per-proof term is a fixed-basis MSM over [P1, P2, delta_g1] /
    [delta_g1] / [delta_g2] — one native batch call each across the group.
    None when a fixed-base table cannot register (caller falls back).
    """
    a_acc, b_g2_acc, b_g1_acc, h_acc, l_acc = acc
    P1 = bn.g1_add(pk.vk.alpha_g1, a_acc)
    P2 = bn.g1_add(pk.beta_g1, b_g1_acc)
    B2 = bn.g2_add(pk.vk.beta_g2, b_g2_acc)
    HL = bn.g1_add(h_acc, l_acc)
    from .. import native

    h_d1 = native.g1_fixed_handle((id(pk), "delta_g1"), [pk.delta_g1])
    h_d2 = native.g2_fixed_handle((id(pk), "delta_g2"), [pk.vk.delta_g2])
    # P1/P2 are per-statement: key by value so repeated batches of the same
    # statement reuse the table (bounded by the native registry cap).
    h_c = native.g1_fixed_handle(
        (tuple(P1), tuple(P2)), [P1, P2, pk.delta_g1]
    )
    if h_d1 is None or h_d2 is None or h_c is None:
        return None
    rs = [(_rand_fr(), _rand_fr()) for _ in range(count)]
    r_delta = native.bn254_g1_msm_fixed_many(
        (id(pk), "delta_g1"), [[r] for r, _ in rs], [pk.delta_g1]
    )
    s_delta2 = native.bn254_g2_msm_fixed_many(
        (id(pk), "delta_g2"), [[s] for _, s in rs], [pk.vk.delta_g2]
    )
    c_terms = native.bn254_g1_msm_fixed_many(
        (tuple(P1), tuple(P2)),
        [[s, r, r * s % R] for r, s in rs],
        [P1, P2, pk.delta_g1],
    )
    return [
        Proof(
            a=bn.g1_add(P1, r_delta[i]),
            b=bn.g2_add(B2, s_delta2[i]),
            c=bn.g1_add(HL, c_terms[i]),
        )
        for i in range(count)
    ]


def prove(pk: ProvingKey, cs: ConstraintSystem, circuit_key=None) -> Proof:
    # full satisfaction re-check is debug-only (arkworks does the same);
    # the h-pipeline still rejects unsatisfied systems via the degree check
    if os.environ.get("LIBZKP_DEBUG_CS"):
        assert cs.is_satisfied(), "constraint system not satisfied"
    n = len(pk.h_query) + 1
    z = cs.full_assignment()
    h = _compute_h(cs, n, circuit_key)
    return _prove_core(pk, z, cs.num_instance, h)


_acc_memo: dict = {}
_acc_memo_lock = threading.Lock()


def prove_assigned(
    pk: ProvingKey,
    z: List[int],
    num_instance: int,
    n_constraints: int,
    circuit_key,
) -> Optional[Proof]:
    """Prove from a pre-built assignment vector, skipping constraint-system
    construction entirely — valid once the circuit's CSR matrices are cached
    (the first prove with the full ConstraintSystem seeds the cache). Returns
    None when the fast path is unavailable; callers fall back to prove()."""
    from .. import native

    if not native.HAVE_NATIVE:
        return None
    n = len(pk.h_query) + 1
    key = (circuit_key, n, n_constraints, len(z))
    csr = _csr_cache.get(key)
    if csr is None:
        return None
    memo_key = None
    if not os.environ.get("LIBZKP_NO_WITNESS_MEMO"):
        # Re-proving an identical statement is a real workload (each proof
        # stays unlinkable through fresh (r, s) blinding), and the h-poly +
        # query-MSM accumulators are deterministic in z — memoize them, the
        # single-prove analogue of prove_assigned_many's duplicate dedup.
        import hashlib

        hz = hashlib.sha256()
        for v in z:
            hz.update((v % R).to_bytes(32, "little"))
        # id(pk) pins the memo to this exact key object (a fresh setup of
        # the same circuit must never serve another key's accumulators); the
        # stored tuple keeps pk alive so the id cannot be recycled.
        memo_key = (id(pk), circuit_key, n, n_constraints, num_instance,
                    hz.digest())
        with _acc_memo_lock:
            hit = _acc_memo.get(memo_key)
        if hit is not None and hit[1] is pk:
            return _finish_proof(pk, *hit[0])
    try:
        h = native.groth16_h(
            n, n_constraints, num_instance, R, BN254_FR.root_of_unity(n), 5, csr, z
        )
    except MemoryError:
        return None  # circuit registry full: caller takes the full prove()
    accs = _prove_accs(pk, z, num_instance, h)
    if memo_key is not None:
        with _acc_memo_lock:
            if len(_acc_memo) >= 64:
                _acc_memo.pop(next(iter(_acc_memo)))
            _acc_memo[memo_key] = (accs, pk)
    return _finish_proof(pk, *accs)


def verify(vk: VerifyingKey, public_inputs: List[int], proof: Proof) -> bool:
    """e(A,B) == e(alpha,beta) e(ic,gamma) e(C,delta); returns False on error."""
    try:
        if len(public_inputs) != len(vk.gamma_abc_g1) - 1:
            return False
        if not (bn.g1_is_on_curve(proof.a) and bn.g1_is_on_curve(proof.c)):
            return False
        if not bn.g2_is_on_curve(proof.b) or not bn.g2_in_subgroup(proof.b):
            return False
        ic = vk.gamma_abc_g1[0]
        for x, base in zip(public_inputs, vk.gamma_abc_g1[1:]):
            ic = bn.g1_add(ic, bn.g1_scalar_mul(x % R, base))
        pairs = [
            (proof.a, proof.b),
            (bn.g1_neg(ic), vk.gamma_g2),
            (bn.g1_neg(proof.c), vk.delta_g2),
        ]
        from .. import native

        if native.HAVE_NATIVE:
            # the (-alpha, beta) Miller value is constant per vk — cache it
            key = id(vk)
            cached = _vk_miller_cache.get(key)
            if cached is None:
                if len(_vk_miller_cache) > 64:
                    _vk_miller_cache.clear()
                cached = native.bn254_miller_bytes(bn.g1_neg(vk.alpha_g1), vk.beta_g2)
                _vk_miller_cache[key] = (cached, vk)  # keep vk alive for id()
            else:
                cached = cached[0]
            out = native.bn254_multi_pairing_premul(cached, pairs)
        else:
            out = bn.multi_pairing(pairs + [(bn.g1_neg(vk.alpha_g1), vk.beta_g2)])
        return out == bn.FQ12_ONE
    except Exception:
        return False


_vk_miller_cache: dict = {}


def verify_batch(vk: VerifyingKey, items: List[Tuple[List[int], Proof]]) -> List[bool]:
    """Batch-verify proofs sharing one verifying key.

    Random-linear-combination of the N pairing equations: with 128-bit
    weights r_i the grand check is

        prod_i e(r_i A_i, B_i) * e(-sum_i r_i IC_i, gamma)
             * e(-sum_i r_i C_i, delta) * e(-(sum_i r_i) alpha, beta) == 1

    — one multi-Miller loop over N+3 pairs and ONE final exponentiation,
    versus N x (3 Miller loops + a final exp) for independent verifies. The
    IC sum collapses into a single fixed-base MSM over gamma_abc (weighted
    public inputs accumulated per column). Bisects on failure so a few bad
    proofs still yield exact per-proof verdicts.
    """
    results = [False] * len(items)
    n_pub = len(vk.gamma_abc_g1) - 1
    live: List[int] = []
    for i, (public_inputs, proof) in enumerate(items):
        try:
            if len(public_inputs) != n_pub:
                continue
            if not (bn.g1_is_on_curve(proof.a) and bn.g1_is_on_curve(proof.c)):
                continue
            if not bn.g2_is_on_curve(proof.b) or not bn.g2_in_subgroup(proof.b):
                continue
            live.append(i)
        except Exception:
            continue

    gamma_abc = list(vk.gamma_abc_g1)
    neg_alpha = bn.g1_neg(vk.alpha_g1)

    def _check(idxs: List[int]) -> None:
        try:
            weights = [_rlc_weight() for _ in idxs]
            pairs = []
            ic_scalars = [0] * (n_pub + 1)
            c_scalars = []
            c_points = []
            for w, i in zip(weights, idxs):
                public_inputs, proof = items[i]
                pairs.append((bn.g1_scalar_mul(w, proof.a), proof.b))
                ic_scalars[0] = (ic_scalars[0] + w) % R
                for j, x in enumerate(public_inputs):
                    ic_scalars[j + 1] = (ic_scalars[j + 1] + w * (x % R)) % R
                c_scalars.append(w)
                c_points.append(proof.c)
            ic = bn.g1_msm_fixed(ic_scalars, gamma_abc)
            c_sum = bn.g1_msm(c_scalars, c_points)
            w_sum = sum(weights) % R
            pairs.append((bn.g1_neg(ic), vk.gamma_g2))
            pairs.append((bn.g1_neg(c_sum), vk.delta_g2))
            pairs.append((bn.g1_scalar_mul(w_sum, neg_alpha), vk.beta_g2))
            ok = bn.multi_pairing(pairs) == bn.FQ12_ONE
        except Exception:
            ok = False
        if ok:
            for i in idxs:
                results[i] = True
        elif len(idxs) > 1:
            mid = len(idxs) // 2
            _check(idxs[:mid])
            _check(idxs[mid:])

    if live:
        _check(live)
    return results


def _rlc_weight() -> int:
    """Nonzero 128-bit random weight for batch combination."""
    w = 0
    while w == 0:
        w = int.from_bytes(os.urandom(16), "little")
    return w


# ---------------------------------------------------------------------------
# Serialization: arkworks `serialize_uncompressed` layout
# (``/root/reference/src/backend/snark.rs:97-105,367-371``). G1 = x||y 64B
# little-endian canonical; G2 = x.c0||x.c1||y.c0||y.c1 128B; ark-serialize
# SWFlags ride the top two bits of the final byte of y (resp. y.c1):
# bit 6 = point at infinity (coordinates zero), bit 7 = y-is-negative
# (y > -y; informational — arkworks' uncompressed deserializer derives y
# from the bytes and only consumes the infinity bit, so readers MUST mask
# both). BN254's 254-bit modulus leaves those two bits free.
# ---------------------------------------------------------------------------

_FLAG_INF = 0x40
_FLAG_NEG = 0x80
_FLAG_MASK = 0xC0


def _fq_is_neg(y: int) -> bool:
    """arkworks SWFlags::from_y_coordinate: negative iff y > -y."""
    return y > (bn.P - y) % bn.P


def _fq2_is_neg(y0: int, y1: int) -> bool:
    """Fq2 ordering compares c1 first, then c0 (arkworks QuadExtField)."""
    n0, n1 = (bn.P - y0) % bn.P, (bn.P - y1) % bn.P
    return (y1, y0) > (n1, n0)


def _g1_bytes(p: bn.G1) -> bytes:
    aff = bn.g1_to_affine(p)
    if aff is None:
        return b"\x00" * 63 + bytes([_FLAG_INF])
    out = bytearray(aff[0].to_bytes(32, "little") + aff[1].to_bytes(32, "little"))
    if _fq_is_neg(aff[1]):
        out[63] |= _FLAG_NEG
    return bytes(out)


def _g1_from(data: bytes) -> Optional[bn.G1]:
    if len(data) != 64:
        return None
    flags = data[63] & _FLAG_MASK
    body = bytes(data[:63]) + bytes([data[63] & ~_FLAG_MASK])
    if flags & _FLAG_INF or body == b"\x00" * 64:
        # all-zero without the flag = round-1 LZTK infinity convention
        return bn.G1_INF if body == b"\x00" * 64 else None
    x = int.from_bytes(body[:32], "little")
    y = int.from_bytes(body[32:], "little")
    if x >= bn.P or y >= bn.P:
        return None
    p = (x, y, 1)
    return p if bn.g1_is_on_curve(p) else None


def _g2_bytes(p: bn.G2) -> bytes:
    aff = bn.g2_to_affine(p)
    if aff is None:
        return b"\x00" * 127 + bytes([_FLAG_INF])
    (x0, x1), (y0, y1) = aff
    out = bytearray(b"".join(v.to_bytes(32, "little") for v in (x0, x1, y0, y1)))
    if _fq2_is_neg(y0, y1):
        out[127] |= _FLAG_NEG
    return bytes(out)


def _g2_from(data: bytes) -> Optional[bn.G2]:
    if len(data) != 128:
        return None
    flags = data[127] & _FLAG_MASK
    body = bytes(data[:127]) + bytes([data[127] & ~_FLAG_MASK])
    if flags & _FLAG_INF or body == b"\x00" * 128:
        return bn.G2_INF if body == b"\x00" * 128 else None
    vals = [int.from_bytes(body[i * 32 : (i + 1) * 32], "little") for i in range(4)]
    if any(v >= bn.P for v in vals):
        return None
    p = ((vals[0], vals[1]), (vals[2], vals[3]), bn.FQ2_ONE)
    return p if bn.g2_is_on_curve(p) else None


def proof_to_bytes(proof: Proof) -> bytes:
    """256 bytes: A (G1) || B (G2) || C (G1) — arkworks element order."""
    return _g1_bytes(proof.a) + _g2_bytes(proof.b) + _g1_bytes(proof.c)


def proof_from_bytes(data: bytes) -> Optional[Proof]:
    if len(data) != 256:
        return None
    a = _g1_from(data[0:64])
    b = _g2_from(data[64:192])
    c = _g1_from(data[192:256])
    if a is None or b is None or c is None:
        return None
    return Proof(a=a, b=b, c=c)


# Key files: raw arkworks `CanonicalSerialize` concatenation, exactly what
# `ProvingKey::<Bn254>::serialize_uncompressed` emits (snark.rs:97-105):
# struct fields in declaration order, `Vec<T>` as u64-LE length + elements.
#   VerifyingKey { alpha_g1, beta_g2, gamma_g2, delta_g2, gamma_abc_g1 }
#   ProvingKey   { vk, beta_g1, delta_g1, a_query, b_g1_query, b_g2_query,
#                  h_query, l_query }
# Round-1 files used a framework-private `LZTK` container; readers keep a
# fallback for those.

_KEY_MAGIC = b"LZTK"
_KEY_VERSION = 1


class _Reader:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0

    def g1(self) -> bn.G1:
        p = _g1_from(self.data[self.pos : self.pos + 64])
        self.pos += 64
        if p is None:
            raise ValueError("bad G1")
        return p

    def g2(self) -> bn.G2:
        p = _g2_from(self.data[self.pos : self.pos + 128])
        self.pos += 128
        if p is None:
            raise ValueError("bad G2")
        return p

    def vec_len(self, width: int = 8) -> int:
        c = int.from_bytes(self.data[self.pos : self.pos + width], "little")
        self.pos += width
        if c > 1 << 24:
            raise ValueError("bad count")
        return c

    def done(self) -> bool:
        return self.pos == len(self.data)


def _vk_write(out: bytearray, vk: VerifyingKey) -> None:
    out += _g1_bytes(vk.alpha_g1)
    out += _g2_bytes(vk.beta_g2)
    out += _g2_bytes(vk.gamma_g2)
    out += _g2_bytes(vk.delta_g2)
    out += struct.pack("<Q", len(vk.gamma_abc_g1))
    for p in vk.gamma_abc_g1:
        out += _g1_bytes(p)


def _vk_read(r: _Reader) -> VerifyingKey:
    alpha_g1 = r.g1()
    beta_g2 = r.g2()
    gamma_g2 = r.g2()
    delta_g2 = r.g2()
    gamma_abc = [r.g1() for _ in range(r.vec_len())]
    return VerifyingKey(alpha_g1, beta_g2, gamma_g2, delta_g2, gamma_abc)


def pk_to_bytes(pk: ProvingKey) -> bytes:
    out = bytearray()
    _vk_write(out, pk.vk)
    out += _g1_bytes(pk.beta_g1)
    out += _g1_bytes(pk.delta_g1)
    for name in ("a_query", "b_g1_query"):
        vec = getattr(pk, name)
        out += struct.pack("<Q", len(vec))
        for p in vec:
            out += _g1_bytes(p)
    out += struct.pack("<Q", len(pk.b_g2_query))
    for p in pk.b_g2_query:
        out += _g2_bytes(p)
    for name in ("h_query", "l_query"):
        vec = getattr(pk, name)
        out += struct.pack("<Q", len(vec))
        for p in vec:
            out += _g1_bytes(p)
    return bytes(out)


def pk_from_bytes(data: bytes) -> Optional[ProvingKey]:
    if data[:4] == _KEY_MAGIC:
        # A raw arkworks key whose alpha_g1.x begins with these 4 bytes
        # (~2^-32) must still load: fall through on LZTK parse failure.
        pk = _pk_from_lztk(data)
        if pk is not None:
            return pk
    try:
        r = _Reader(data)
        vk = _vk_read(r)
        beta_g1 = r.g1()
        delta_g1 = r.g1()
        a_query = [r.g1() for _ in range(r.vec_len())]
        b_g1_query = [r.g1() for _ in range(r.vec_len())]
        b_g2_query = [r.g2() for _ in range(r.vec_len())]
        h_query = [r.g1() for _ in range(r.vec_len())]
        l_query = [r.g1() for _ in range(r.vec_len())]
        if not r.done():
            return None
        return ProvingKey(
            vk, beta_g1, delta_g1, a_query, b_g1_query, b_g2_query, h_query, l_query
        )
    except Exception:
        return None


def vk_to_bytes(vk: VerifyingKey) -> bytes:
    out = bytearray()
    _vk_write(out, vk)
    return bytes(out)


def vk_from_bytes(data: bytes) -> Optional[VerifyingKey]:
    if data[:4] == _KEY_MAGIC:
        vk = _vk_from_lztk(data)
        if vk is not None:
            return vk
    try:
        r = _Reader(data)
        vk = _vk_read(r)
        return vk if r.done() else None
    except Exception:
        return None


# -- round-1 `LZTK` container readers (back-compat) --------------------------


def _pk_from_lztk(data: bytes) -> Optional[ProvingKey]:
    try:
        if struct.unpack("<I", data[4:8])[0] != _KEY_VERSION:
            return None
        r = _Reader(data)
        r.pos = 8
        alpha_g1 = r.g1()
        beta_g2 = r.g2()
        gamma_g2 = r.g2()
        delta_g2 = r.g2()
        gamma_abc = [r.g1() for _ in range(r.vec_len(4))]
        beta_g1 = r.g1()
        delta_g1 = r.g1()
        a_query = [r.g1() for _ in range(r.vec_len(4))]
        b_g1_query = [r.g1() for _ in range(r.vec_len(4))]
        h_query = [r.g1() for _ in range(r.vec_len(4))]
        l_query = [r.g1() for _ in range(r.vec_len(4))]
        b_g2_query = [r.g2() for _ in range(r.vec_len(4))]
        if not r.done():
            return None
        vk = VerifyingKey(alpha_g1, beta_g2, gamma_g2, delta_g2, gamma_abc)
        return ProvingKey(
            vk, beta_g1, delta_g1, a_query, b_g1_query, b_g2_query, h_query, l_query
        )
    except Exception:
        return None


def _vk_from_lztk(data: bytes) -> Optional[VerifyingKey]:
    try:
        if struct.unpack("<I", data[4:8])[0] != _KEY_VERSION:
            return None
        r = _Reader(data)
        r.pos = 8
        alpha_g1 = r.g1()
        beta_g2 = r.g2()
        gamma_g2 = r.g2()
        delta_g2 = r.g2()
        abc = [r.g1() for _ in range(r.vec_len(4))]
        if not r.done():
            return None
        return VerifyingKey(alpha_g1, beta_g2, gamma_g2, delta_g2, abc)
    except Exception:
        return None
