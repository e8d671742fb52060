"""Clean-room second parser for the arkworks uncompressed Groth16 wire.

Written from the documented layout alone (`docs/INTEROP.md` item 2 and the
arkworks `CanonicalSerialize` rules) — deliberately NOT from
``libzkp_tpu/models/groth16.py`` — forming a differential pair for the
Groth16 proof/key byte formats (VERDICT r4 #4b), like ``tests/wf_parser2.py``
does for the winterfell container.

Layout rules implemented here (arkworks 0.5 `serialize_uncompressed`,
consumed by the reference at /root/reference/src/backend/snark.rs:97-105 and
:343-400):

  * Fq element: 32 bytes little-endian, value < p.
  * G1 affine point: x (32) || y (32); flags ride the TOP TWO BITS of the
    LAST byte: bit 6 (0x40) = point at infinity (coordinates all zero),
    bit 7 (0x80) = y is "negative" (y > -y mod p).  Readers mask both flag
    bits out of the y coordinate before use.
  * G2 affine point: x.c0 || x.c1 || y.c0 || y.c1 (4 x 32), flags on the
    last byte as above; the Fq2 negativity order compares c1 first then c0.
  * Proof: a (G1) || b (G2) || c (G1)  => 256 bytes.
  * VerifyingKey: alpha_g1 (G1) || beta_g2 || gamma_g2 || delta_g2 (G2 each)
    || gamma_abc_g1 (u64-LE count, then count G1s).
  * ProvingKey: vk || beta_g1 || delta_g1 (G1s) || a_query || b_g1_query
    (G1 vecs) || b_g2_query (G2 vec) || h_query || l_query (G1 vecs), every
    Vec as u64-LE length + elements.
  * On parse, points must be on the curve (y^2 = x^3 + 3 for G1;
    y^2 = x^3 + 3/(9+u) for G2).  Subgroup membership of G2 is NOT checked
    at parse time (G1 has cofactor 1; for G2 the pairing equation is the
    verifier's membership check) — matching `Validate::No` semantics on the
    load path.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional, Tuple

P = 21888242871839275222246405745257275088696311157297823662689037894645226208583

FLAG_INF = 0x40
FLAG_NEG = 0x80
FLAG_MASK = 0xC0

# b coefficients: G1 y^2 = x^3 + 3; twist b = 3 / (9 + u) over Fq2
Fq2 = Tuple[int, int]


def _fq2_mul(a: Fq2, b: Fq2) -> Fq2:
    # (a0 + a1 u)(b0 + b1 u) with u^2 = -1
    return (
        (a[0] * b[0] - a[1] * b[1]) % P,
        (a[0] * b[1] + a[1] * b[0]) % P,
    )


def _fq2_inv(a: Fq2) -> Fq2:
    d = pow(a[0] * a[0] + a[1] * a[1], P - 2, P)
    return (a[0] * d % P, (P - a[1]) * d % P)


TWIST_B: Fq2 = _fq2_mul((3, 0), _fq2_inv((9, 1)))


@dataclass
class G1A:
    x: int
    y: int
    inf: bool = False


@dataclass
class G2A:
    x: Fq2
    y: Fq2
    inf: bool = False


class Reader2:
    def __init__(self, data: bytes):
        self.d = data
        self.pos = 0

    def take(self, n: int) -> bytes:
        if self.pos + n > len(self.d):
            raise ValueError("short read")
        out = self.d[self.pos : self.pos + n]
        self.pos += n
        return out

    def u64(self) -> int:
        return int.from_bytes(self.take(8), "little")

    def g1(self) -> G1A:
        raw = bytearray(self.take(64))
        flags = raw[63] & FLAG_MASK
        raw[63] &= ~FLAG_MASK & 0xFF
        x = int.from_bytes(raw[:32], "little")
        y = int.from_bytes(raw[32:], "little")
        if flags & FLAG_INF or (x == 0 and y == 0 and not flags):
            # zero coords with no flag: legacy infinity convention, accepted
            if x or y:
                raise ValueError("nonzero infinity")
            return G1A(0, 0, inf=True)
        if x >= P or y >= P:
            raise ValueError("coordinate out of field")
        if (y * y - (x * x * x + 3)) % P:
            raise ValueError("not on G1 curve")
        return G1A(x, y)

    def g2(self) -> G2A:
        raw = bytearray(self.take(128))
        flags = raw[127] & FLAG_MASK
        raw[127] &= ~FLAG_MASK & 0xFF
        v = [int.from_bytes(raw[32 * i : 32 * i + 32], "little") for i in range(4)]
        if flags & FLAG_INF or (not any(v) and not flags):
            if any(v):
                raise ValueError("nonzero infinity")
            return G2A((0, 0), (0, 0), inf=True)
        if any(c >= P for c in v):
            raise ValueError("coordinate out of field")
        x: Fq2 = (v[0], v[1])
        y: Fq2 = (v[2], v[3])
        x3 = _fq2_mul(_fq2_mul(x, x), x)
        y2 = _fq2_mul(y, y)
        if (y2[0] - x3[0] - TWIST_B[0]) % P or (y2[1] - x3[1] - TWIST_B[1]) % P:
            raise ValueError("not on G2 curve")
        return G2A(x, y)

    def done(self) -> bool:
        return self.pos == len(self.d)


def _g1_write(p: G1A) -> bytes:
    if p.inf:
        return b"\x00" * 63 + bytes([FLAG_INF])
    out = bytearray(p.x.to_bytes(32, "little") + p.y.to_bytes(32, "little"))
    if p.y > (P - p.y) % P:
        out[63] |= FLAG_NEG
    return bytes(out)


def _g2_write(p: G2A) -> bytes:
    if p.inf:
        return b"\x00" * 127 + bytes([FLAG_INF])
    out = bytearray(
        b"".join(c.to_bytes(32, "little") for c in (p.x[0], p.x[1], p.y[0], p.y[1]))
    )
    n = ((P - p.y[0]) % P, (P - p.y[1]) % P)
    if (p.y[1], p.y[0]) > (n[1], n[0]):
        out[127] |= FLAG_NEG
    return bytes(out)


@dataclass
class Proof2:
    a: G1A
    b: G2A
    c: G1A


@dataclass
class Vk2:
    alpha_g1: G1A
    beta_g2: G2A
    gamma_g2: G2A
    delta_g2: G2A
    gamma_abc_g1: List[G1A]


@dataclass
class Pk2:
    vk: Vk2
    beta_g1: G1A
    delta_g1: G1A
    a_query: List[G1A]
    b_g1_query: List[G1A]
    b_g2_query: List[G2A]
    h_query: List[G1A]
    l_query: List[G1A]


def parse_proof(data: bytes) -> Optional[Proof2]:
    if len(data) != 256:
        return None
    try:
        r = Reader2(data)
        out = Proof2(r.g1(), r.g2(), r.g1())
        return out if r.done() else None
    except ValueError:
        return None


def write_proof(p: Proof2) -> bytes:
    return _g1_write(p.a) + _g2_write(p.b) + _g1_write(p.c)


def _vk_read(r: Reader2) -> Vk2:
    alpha = r.g1()
    beta = r.g2()
    gamma = r.g2()
    delta = r.g2()
    cnt = r.u64()
    if cnt > 1 << 24:
        raise ValueError("bad count")
    abc = [r.g1() for _ in range(cnt)]
    return Vk2(alpha, beta, gamma, delta, abc)


def parse_vk(data: bytes) -> Optional[Vk2]:
    try:
        r = Reader2(data)
        vk = _vk_read(r)
        return vk if r.done() else None
    except ValueError:
        return None


def write_vk(vk: Vk2) -> bytes:
    out = bytearray()
    out += _g1_write(vk.alpha_g1)
    out += _g2_write(vk.beta_g2)
    out += _g2_write(vk.gamma_g2)
    out += _g2_write(vk.delta_g2)
    out += len(vk.gamma_abc_g1).to_bytes(8, "little")
    for p in vk.gamma_abc_g1:
        out += _g1_write(p)
    return bytes(out)


def parse_pk(data: bytes) -> Optional[Pk2]:
    try:
        r = Reader2(data)
        vk = _vk_read(r)

        def g1_vec() -> List[G1A]:
            cnt = r.u64()
            if cnt > 1 << 24:
                raise ValueError("bad count")
            return [r.g1() for _ in range(cnt)]

        beta_g1 = r.g1()
        delta_g1 = r.g1()
        a_query = g1_vec()
        b_g1_query = g1_vec()
        cnt = r.u64()
        if cnt > 1 << 24:
            raise ValueError("bad count")
        b_g2_query = [r.g2() for _ in range(cnt)]
        h_query = g1_vec()
        l_query = g1_vec()
        if not r.done():
            return None
        return Pk2(vk, beta_g1, delta_g1, a_query, b_g1_query, b_g2_query, h_query, l_query)
    except ValueError:
        return None


def write_pk(pk: Pk2) -> bytes:
    out = bytearray()
    out += write_vk(pk.vk)
    out += _g1_write(pk.beta_g1)
    out += _g1_write(pk.delta_g1)
    for vec in (pk.a_query, pk.b_g1_query):
        out += len(vec).to_bytes(8, "little")
        for p in vec:
            out += _g1_write(p)
    out += len(pk.b_g2_query).to_bytes(8, "little")
    for p in pk.b_g2_query:
        out += _g2_write(p)
    for vec in (pk.h_query, pk.l_query):
        out += len(vec).to_bytes(8, "little")
        for p in vec:
            out += _g1_write(p)
    return bytes(out)
