"""STARK proof system (DEEP-ALI + FRI) over f128, Blake3 Merkle commitments.

TPU-native rebuild of the reference's winterfell-based STARK backend
(``/root/reference/src/backend/stark.rs``): same AIR (1-column linear
interpolation trace, one degree-1 transition constraint, two boundary
assertions — stark.rs:720-790), same parameters
(``ProofOptions::new(32, 8, 0, None, 8, 31)``, stark.rs:800-808), same field
(f128) and hash (Blake3-256). The pipeline is architected like winterfell's
(trace LDE -> Merkle commit -> constraint composition -> DEEP -> FRI ->
queries) but implemented from scratch; the wire format is this module's own
versioned layout (byte-interop golden vectors vs the Rust binary are a
cross-toolchain harness concern, see docs/INTEROP.md).

The generic :class:`Air`/:func:`prove`/:func:`verify` interfaces support any
width/length power-of-two trace; batched proving vectorizes the LDE NTT on
TPU via :mod:`libzkp_tpu.ops.ntt`.
"""

from __future__ import annotations

import functools
import struct
from dataclasses import dataclass, field as dc_field
from typing import List, Sequence, Tuple

from ..ops import ntt as poly
from ..ops.field import F128, PrimeField
from .merkle import MerkleTree, hash_element_rows, hash_elements
from .random_coin import RandomCoin

# LDE coset offset; any element outside the 2-adic subgroups works. We pin 3
# (asserted at prove time via offset^N != 1).
DOMAIN_OFFSET = 3

PROOF_FORMAT_VERSION = 1


@dataclass(frozen=True)
class ProofOptions:
    """Mirrors winterfell ProofOptions (stark.rs:800-808)."""

    num_queries: int = 32
    blowup: int = 8
    grinding: int = 0
    folding: int = 8
    max_remainder_degree: int = 31

    def to_bytes(self) -> bytes:
        return struct.pack(
            "<BBBBH",
            self.num_queries,
            self.blowup,
            self.grinding,
            self.folding,
            self.max_remainder_degree,
        )

    @classmethod
    def from_bytes(cls, data: bytes) -> "ProofOptions":
        nq, bl, gr, fo, mrd = struct.unpack("<BBBBH", data)
        return cls(nq, bl, gr, fo, mrd)


class Air:
    """Algebraic intermediate representation: subclass per statement."""

    field: PrimeField = F128

    def __init__(self, trace_length: int, trace_width: int, pub_inputs: Sequence[int], options: ProofOptions):
        assert trace_length & (trace_length - 1) == 0
        self.trace_length = trace_length
        self.trace_width = trace_width
        self.pub_inputs = [int(x) for x in pub_inputs]
        self.options = options

    # -- to be overridden --------------------------------------------------
    def transition_degrees(self) -> List[int]:
        raise NotImplementedError

    def evaluate_transition(self, current: List[int], nxt: List[int]) -> List[int]:
        raise NotImplementedError

    def get_assertions(self) -> List[Tuple[int, int, int]]:
        """List of (column, step, value) boundary assertions."""
        raise NotImplementedError

    # -- derived -----------------------------------------------------------
    def num_composition_columns(self) -> int:
        return max(1, max(self.transition_degrees()))

    def context_bytes(self) -> bytes:
        """Random-coin seed material: binds field, trace shape, options, inputs."""
        out = bytearray(b"libzkp_tpu_stark_v1")
        out += self.field.p.to_bytes(32, "little")
        out += struct.pack("<IB", self.trace_length, self.trace_width)
        out += self.options.to_bytes()
        out += struct.pack("<I", len(self.pub_inputs))
        for x in self.pub_inputs:
            out += int(x).to_bytes(self.field.nbytes, "little")
        return bytes(out)


# ---------------------------------------------------------------------------
# Serialization helpers
# ---------------------------------------------------------------------------


class _Writer:
    def __init__(self):
        self.buf = bytearray()

    def u8(self, v):
        self.buf.append(v & 0xFF)

    def u16(self, v):
        self.buf += struct.pack("<H", v)

    def u32(self, v):
        self.buf += struct.pack("<I", v)

    def u64(self, v):
        self.buf += struct.pack("<Q", v)

    def felt(self, F, v):
        self.buf += int(v).to_bytes(F.nbytes, "little")

    def felts(self, F, vs):
        for v in vs:
            self.felt(F, v)

    def raw(self, b):
        self.buf += b

    def bytes(self) -> bytes:
        return bytes(self.buf)


class _Reader:
    def __init__(self, data: bytes):
        self.data = bytes(data)
        self.pos = 0

    def _take(self, n: int) -> bytes:
        if self.pos + n > len(self.data):
            raise ValueError("truncated STARK proof")
        out = self.data[self.pos : self.pos + n]
        self.pos += n
        return out

    def u8(self):
        return self._take(1)[0]

    def u16(self):
        return struct.unpack("<H", self._take(2))[0]

    def u32(self):
        return struct.unpack("<I", self._take(4))[0]

    def u64(self):
        return struct.unpack("<Q", self._take(8))[0]

    def felt(self, F):
        v = int.from_bytes(self._take(F.nbytes), "little")
        if v >= F.p:
            raise ValueError("non-canonical field element")
        return v

    def felts(self, F, n):
        return [self.felt(F) for _ in range(n)]

    def raw(self, n):
        return self._take(n)

    def done(self) -> bool:
        return self.pos == len(self.data)


# ---------------------------------------------------------------------------
# FRI
# ---------------------------------------------------------------------------


def _fri_layer_plan(options: ProofOptions, lde_size: int) -> List[int]:
    """Domain sizes at each committed FRI layer (before remainder)."""
    max_rem = (options.max_remainder_degree + 1) * options.blowup
    sizes = []
    size = lde_size
    while size > max_rem:
        sizes.append(size)
        size //= options.folding
    return sizes


def _lagrange_eval(F: PrimeField, xs: List[int], ys: List[int], at: int) -> int:
    """Evaluate the interpolating polynomial through (xs, ys) at ``at``."""
    p = F.p
    total = 0
    for i in range(len(xs)):
        num, den = 1, 1
        for j in range(len(xs)):
            if i == j:
                continue
            num = num * ((at - xs[j]) % p) % p
            den = den * ((xs[i] - xs[j]) % p) % p
        total = (total + ys[i] * num % p * F.inv(den)) % p
    return total


# ---------------------------------------------------------------------------
# Prover
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=32)
def _domain_ctx(F: PrimeField, n: int, N: int, offset: int, steps: Tuple[int, ...]):
    """Proof-independent evaluation-domain constants, cached per AIR shape.

    xs (the coset points), the inverted transition zerofier with its
    last-step exemption folded in, and the inverted boundary zerofiers for
    the assertion steps depend only on (field, trace shape, offset) — one
    proof pays for them, every later proof of the same shape reuses them.
    """
    p = F.p
    g_n = F.root_of_unity(n)
    g_N = F.root_of_unity(N)
    xs = [offset % p]
    for _ in range(N - 1):
        xs.append(xs[-1] * g_N % p)
    exemption = pow(g_n, n - 1, p)
    zerofier_den = []
    for x in xs:
        xn = x
        m = n
        while m > 1:  # n is a power of two: square-chain instead of pow()
            xn = xn * xn % p
            m >>= 1
        zerofier_den.append((xn - 1) % p)
    inv_zerofier = F.batch_inv(zerofier_den)
    zinv = [inv_zerofier[r] * ((xs[r] - exemption) % p) % p for r in range(N)]
    inv_boundary = []
    for step in steps:
        pt = pow(g_n, step, p)
        inv_boundary.append(F.batch_inv([(x - pt) % p for x in xs]))
    return xs, zinv, inv_boundary


def prove(air: Air, trace_columns: List[List[int]], precomputed=None) -> bytes:
    """``precomputed``: optional (trace_polys, trace_lde) pair — the batch
    prover computes those for many proofs at once on the TPU."""
    F = air.field
    p = F.p
    n = air.trace_length
    w = air.trace_width
    opts = air.options
    N = n * opts.blowup
    assert len(trace_columns) == w and all(len(c) == n for c in trace_columns)

    g_n = F.root_of_unity(n)
    g_N = F.root_of_unity(N)
    offset = DOMAIN_OFFSET
    assert pow(offset, N, p) != 1, "domain offset lies in the LDE subgroup"

    # 1. trace polynomials + LDE
    if precomputed is not None:
        trace_polys, trace_lde = precomputed
    else:
        trace_polys = [poly.interpolate(F, col) for col in trace_columns]
        trace_lde = [poly.evaluate_coset(F, c, N, offset) for c in trace_polys]

    # 2. trace commitment
    trace_leaves = hash_element_rows(F, [[trace_lde[i][r] for i in range(w)] for r in range(N)])
    trace_tree = MerkleTree(trace_leaves)

    coin = RandomCoin(air.context_bytes())
    coin.reseed(trace_tree.root)

    # 3. constraint composition coefficients
    t_degrees = air.transition_degrees()
    assertions = air.get_assertions()
    alphas = coin.draw_felts(F, len(t_degrees))
    betas = coin.draw_felts(F, len(assertions))

    # 4. composition evaluations over the LDE domain (cached domain consts)
    xs, zinv_all, inv_boundary = _domain_ctx(
        F, n, N, offset, tuple(step for (_, step, _) in assertions)
    )

    comp_evals = []
    for r in range(N):
        cur = [trace_lde[i][r] for i in range(w)]
        nxt = [trace_lde[i][(r + opts.blowup) % N] for i in range(w)]
        t_evals = air.evaluate_transition(cur, nxt)
        acc = 0
        zinv = zinv_all[r]
        for a, ev in zip(alphas, t_evals):
            acc = (acc + a * ev % p * zinv) % p
        for j, (col, _, value) in enumerate(assertions):
            acc = (acc + betas[j] * ((cur[col] - value) % p) % p * inv_boundary[j][r]) % p
        comp_evals.append(acc)

    comp_coeffs = poly.interpolate_coset(F, comp_evals, offset)
    k = air.num_composition_columns()
    deg = poly.poly_degree(comp_coeffs)
    assert deg < k * n, f"composition degree {deg} exceeds {k}*{n}"
    comp_chunks = [comp_coeffs[j * n : (j + 1) * n] for j in range(k)]
    comp_chunks = [c + [0] * (n - len(c)) for c in comp_chunks]
    comp_lde = [poly.evaluate_coset(F, c, N, offset) for c in comp_chunks]
    comp_leaves = hash_element_rows(F, [[comp_lde[j][r] for j in range(k)] for r in range(N)])
    comp_tree = MerkleTree(comp_leaves)
    coin.reseed(comp_tree.root)

    # 5. OOD evaluations
    z = coin.draw_felt(F)
    zg = z * g_n % p
    ood_cur = [poly.poly_eval(F, c, z) for c in trace_polys]
    ood_nxt = [poly.poly_eval(F, c, zg) for c in trace_polys]
    ood_comp = [poly.poly_eval(F, c, z) for c in comp_chunks]
    coin.reseed(hash_elements(F, ood_cur + ood_nxt + ood_comp))

    # 6. DEEP composition
    gammas = coin.draw_felts(F, 2 * w + k)
    inv_xz = F.batch_inv([(x - z) % p for x in xs])
    inv_xzg = F.batch_inv([(x - zg) % p for x in xs])
    deep = []
    for r in range(N):
        acc = 0
        for i in range(w):
            acc = (acc + gammas[i] * ((trace_lde[i][r] - ood_cur[i]) % p) % p * inv_xz[r]) % p
            acc = (acc + gammas[w + i] * ((trace_lde[i][r] - ood_nxt[i]) % p) % p * inv_xzg[r]) % p
        for j in range(k):
            acc = (acc + gammas[2 * w + j] * ((comp_lde[j][r] - ood_comp[j]) % p) % p * inv_xz[r]) % p
        deep.append(acc)

    # 7. FRI commit phase
    layer_sizes = _fri_layer_plan(opts, N)
    fri_trees: List[MerkleTree] = []
    fri_rows: List[List[List[int]]] = []
    fri_betas: List[int] = []
    evals = deep
    cur_offset = offset
    cur_size = N
    for _size in layer_sizes:
        f = opts.folding
        stride = cur_size // f
        rows = [[evals[r + t * stride] for t in range(f)] for r in range(stride)]
        tree = MerkleTree(hash_element_rows(F, rows))
        fri_trees.append(tree)
        fri_rows.append(rows)
        coin.reseed(tree.root)
        beta = coin.draw_felt(F)
        fri_betas.append(beta)
        g_cur = F.root_of_unity(cur_size)
        eta = pow(g_cur, stride, p)  # folding-th root of unity
        new_evals = []
        for r in range(stride):
            x0 = cur_offset * pow(g_cur, r, p) % p
            pts = [x0 * pow(eta, t, p) % p for t in range(f)]
            new_evals.append(_lagrange_eval(F, pts, rows[r], beta))
        evals = new_evals
        cur_offset = pow(cur_offset, f, p)
        cur_size = stride

    remainder = poly.interpolate_coset(F, evals, cur_offset)
    rem_deg = poly.poly_degree(remainder)
    assert rem_deg <= opts.max_remainder_degree, "FRI remainder degree too high"
    remainder = remainder[: opts.max_remainder_degree + 1]
    coin.reseed(hash_elements(F, remainder))

    # 8. proof-of-work + query positions
    nonce = 0
    while not coin.check_leading_zeros(nonce, opts.grinding):
        nonce += 1
    positions = coin.draw_integers(opts.num_queries, N, nonce)

    # 9. serialize
    wtr = _Writer()
    wtr.u8(PROOF_FORMAT_VERSION)
    wtr.u32(n)
    wtr.u8(w)
    wtr.raw(opts.to_bytes())
    wtr.raw(trace_tree.root)
    wtr.raw(comp_tree.root)
    wtr.u8(k)
    wtr.felts(F, ood_cur)
    wtr.felts(F, ood_nxt)
    wtr.felts(F, ood_comp)
    wtr.u8(len(layer_sizes))
    for tree in fri_trees:
        wtr.raw(tree.root)
    wtr.u16(len(remainder))
    wtr.felts(F, remainder)
    wtr.u64(nonce)
    wtr.u8(len(positions))
    # Batched openings: rows for all queried positions, then the minimal
    # Merkle node set (winterfell BatchMerkleProof equivalent).
    for q in positions:
        wtr.felts(F, [trace_lde[i][q] for i in range(w)])
    t_nodes = trace_tree.open_many(positions)
    wtr.u16(len(t_nodes))
    for node in t_nodes:
        wtr.raw(node)
    for q in positions:
        wtr.felts(F, [comp_lde[j][q] for j in range(k)])
    c_nodes = comp_tree.open_many(positions)
    wtr.u16(len(c_nodes))
    for node in c_nodes:
        wtr.raw(node)
    # FRI layers: deduplicated folded positions per layer.
    cur_positions = list(positions)
    for li, size_l in enumerate(layer_sizes):
        stride = size_l // opts.folding
        fold_positions = sorted(set(q % stride for q in cur_positions))
        for r in fold_positions:
            wtr.felts(F, fri_rows[li][r])
        l_nodes = fri_trees[li].open_many(fold_positions)
        wtr.u16(len(l_nodes))
        for node in l_nodes:
            wtr.raw(node)
        cur_positions = fold_positions
    return wtr.bytes()


# ---------------------------------------------------------------------------
# Verifier
# ---------------------------------------------------------------------------


def verify(air: Air, proof_bytes: bytes) -> bool:
    """Return True iff the proof verifies; never raises on malformed input."""
    try:
        return _verify_inner(air, proof_bytes)
    except Exception:
        return False


def _verify_inner(air: Air, proof_bytes: bytes) -> bool:
    F = air.field
    p = F.p
    opts = air.options
    rdr = _Reader(proof_bytes)

    if rdr.u8() != PROOF_FORMAT_VERSION:
        return False
    n = rdr.u32()
    w = rdr.u8()
    if n != air.trace_length or w != air.trace_width:
        return False
    popts = ProofOptions.from_bytes(rdr.raw(6))
    if popts != opts:  # AcceptableOptions::OptionSet equivalent (stark.rs:905-907)
        return False
    N = n * opts.blowup
    g_n = F.root_of_unity(n)
    g_N = F.root_of_unity(N)
    offset = DOMAIN_OFFSET

    trace_root = rdr.raw(32)
    comp_root = rdr.raw(32)
    k = rdr.u8()
    if k != air.num_composition_columns():
        return False
    ood_cur = rdr.felts(F, w)
    ood_nxt = rdr.felts(F, w)
    ood_comp = rdr.felts(F, k)

    num_layers = rdr.u8()
    layer_sizes = _fri_layer_plan(opts, N)
    if num_layers != len(layer_sizes):
        return False
    fri_roots = [rdr.raw(32) for _ in range(num_layers)]
    rem_len = rdr.u16()
    if rem_len > opts.max_remainder_degree + 1:
        return False
    remainder = rdr.felts(F, rem_len)
    nonce = rdr.u64()
    n_positions = rdr.u8()

    # Rebuild the coin transcript
    coin = RandomCoin(air.context_bytes())
    coin.reseed(trace_root)
    t_degrees = air.transition_degrees()
    assertions = air.get_assertions()
    alphas = coin.draw_felts(F, len(t_degrees))
    betas = coin.draw_felts(F, len(assertions))
    coin.reseed(comp_root)
    z = coin.draw_felt(F)
    zg = z * g_n % p
    coin.reseed(hash_elements(F, ood_cur + ood_nxt + ood_comp))
    gammas = coin.draw_felts(F, 2 * w + k)
    fri_betas = []
    for root in fri_roots:
        coin.reseed(root)
        fri_betas.append(coin.draw_felt(F))
    coin.reseed(hash_elements(F, remainder))
    if not coin.check_leading_zeros(nonce, opts.grinding):
        return False
    positions = coin.draw_integers(opts.num_queries, N, nonce)
    if n_positions != len(positions):
        return False

    # --- OOD constraint check (the ALI equation) ---
    exemption = pow(g_n, n - 1, p)
    zn = pow(z, n, p)
    if zn == 1:
        return False
    t_evals = air.evaluate_transition(ood_cur, ood_nxt)
    acc = 0
    zinv = F.inv((zn - 1) % p) * ((z - exemption) % p) % p
    for a, ev in zip(alphas, t_evals):
        acc = (acc + a * ev % p * zinv) % p
    for j, (col, step, value) in enumerate(assertions):
        den = (z - pow(g_n, step, p)) % p
        if den == 0:
            return False
        acc = (acc + betas[j] * ((ood_cur[col] - value) % p) % p * F.inv(den)) % p
    hz = 0
    for j in range(k):
        hz = (hz + pow(z, j * n, p) * ood_comp[j]) % p
    if acc != hz:
        return False

    # --- query checks (batched Merkle openings) ---
    depth_t = (N - 1).bit_length()
    trace_rows = [rdr.felts(F, w) for _ in positions]
    n_nodes = rdr.u16()
    t_nodes = [rdr.raw(32) for _ in range(n_nodes)]
    if not MerkleTree.verify_many(
        trace_root, depth_t, positions,
        [hash_elements(F, row) for row in trace_rows], t_nodes,
    ):
        return False
    comp_rows = [rdr.felts(F, k) for _ in positions]
    n_nodes = rdr.u16()
    c_nodes = [rdr.raw(32) for _ in range(n_nodes)]
    if not MerkleTree.verify_many(
        comp_root, depth_t, positions,
        [hash_elements(F, row) for row in comp_rows], c_nodes,
    ):
        return False

    # FRI layer rows
    fri_layer_rows = []  # per layer: dict r -> row
    cur_positions = list(positions)
    for li, size_l in enumerate(layer_sizes):
        stride = size_l // opts.folding
        fold_positions = sorted(set(q % stride for q in cur_positions))
        rows = {r: rdr.felts(F, opts.folding) for r in fold_positions}
        n_nodes = rdr.u16()
        l_nodes = [rdr.raw(32) for _ in range(n_nodes)]
        depth_l = (stride - 1).bit_length()
        if not MerkleTree.verify_many(
            fri_roots[li], depth_l, fold_positions,
            [hash_elements(F, rows[r]) for r in fold_positions], l_nodes,
        ):
            return False
        fri_layer_rows.append(rows)
        cur_positions = fold_positions

    final_size = N // (opts.folding ** num_layers) if num_layers else N
    for qi, q in enumerate(positions):
        x_q = offset * pow(g_N, q, p) % p
        trace_row = trace_rows[qi]
        comp_row = comp_rows[qi]

        # recompute DEEP value at q
        inv_xz = F.inv((x_q - z) % p)
        inv_xzg = F.inv((x_q - zg) % p)
        deep_val = 0
        for i in range(w):
            deep_val = (deep_val + gammas[i] * ((trace_row[i] - ood_cur[i]) % p) % p * inv_xz) % p
            deep_val = (deep_val + gammas[w + i] * ((trace_row[i] - ood_nxt[i]) % p) % p * inv_xzg) % p
        for j in range(k):
            deep_val = (deep_val + gammas[2 * w + j] * ((comp_row[j] - ood_comp[j]) % p) % p * inv_xz) % p

        # walk FRI layers
        q_l = q
        cur_val = deep_val
        cur_offset = offset
        for li, size_l in enumerate(layer_sizes):
            f = opts.folding
            stride = size_l // f
            r = q_l % stride
            t_idx = q_l // stride
            row = fri_layer_rows[li][r]
            if row[t_idx] != cur_val:
                return False
            g_cur = F.root_of_unity(size_l)
            eta = pow(g_cur, stride, p)
            x0 = cur_offset * pow(g_cur, r, p) % p
            pts = [x0 * pow(eta, t, p) % p for t in range(f)]
            cur_val = _lagrange_eval(F, pts, row, fri_betas[li])
            cur_offset = pow(cur_offset, f, p)
            q_l = r
        # final: against the remainder polynomial over the last domain
        g_fin = F.root_of_unity(final_size)
        x_fin = cur_offset * pow(g_fin, q_l, p) % p
        if poly.poly_eval(F, remainder, x_fin) != cur_val:
            return False

    return rdr.done()
