"""Clean-room second parser for the dalek bulletproofs `RangeProof` wire.

Written from the documented layout alone (`docs/INTEROP.md` item 1: 7 x 32-byte
elements, then `rounds` x 64 bytes of L/R pairs, then 64 bytes of final
scalars; scalars canonical mod l, points are 32-byte Ristretto encodings) —
deliberately NOT from ``libzkp_tpu/models/bulletproofs.py`` — so the two
implementations form a differential pair like ``tests/wf_parser2.py`` does for
the winterfell container (VERDICT r4 #4b).

Layout being pinned (n = 64 single proof => 6 rounds => 672 bytes total,
matching ``bulletproofs 5.0 RangeProof::to_bytes``; reference consumption at
/root/reference/src/backend/bulletproofs.rs:160-177):

    offset  size  field
    0       32    A        (compressed Ristretto point)
    32      32    S        (compressed Ristretto point)
    64      32    T_1      (compressed Ristretto point)
    96      32    T_2      (compressed Ristretto point)
    128     32    t_x          (canonical scalar, little-endian, < l)
    160     32    t_x_blinding (canonical scalar)
    192     32    e_blinding   (canonical scalar)
    224     64*r  IPP round j: L_j (32 B point) || R_j (32 B point)
    224+64r 32    IPP a (canonical scalar)
    256+64r 32    IPP b (canonical scalar)

Rejection rules implemented here, from the dalek from_bytes contract:
  * total length must be 7*32 + r*64 + 64 for some integer r >= 0
  * every scalar field must be canonical (value < l with top bit clear by
    consequence); non-canonical encodings reject the whole proof
  * point fields are NOT validated at parse time (dalek defers decompression
    to verification), so any 32 bytes are accepted structurally
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional

# Ristretto scalar field order l = 2^252 + 27742317777372353535851937790883648493
GROUP_ORDER = (1 << 252) + 27742317777372353535851937790883648493


def _scalar(data: bytes) -> Optional[int]:
    """Canonical little-endian scalar; None when >= l."""
    if len(data) != 32:
        return None
    v = int.from_bytes(data, "little")
    return v if v < GROUP_ORDER else None


@dataclass
class RangeProof2:
    A: bytes
    S: bytes
    T_1: bytes
    T_2: bytes
    t_x: int
    t_x_blinding: int
    e_blinding: int
    L: List[bytes]
    R: List[bytes]
    a: int
    b: int

    @property
    def rounds(self) -> int:
        return len(self.L)


def parse_range_proof(data: bytes) -> Optional[RangeProof2]:
    if len(data) < 7 * 32 + 2 * 32:
        return None
    tail = len(data) - 7 * 32 - 2 * 32
    if tail % 64:
        return None
    rounds = tail // 64
    A, S, T1, T2 = (data[32 * i : 32 * i + 32] for i in range(4))
    t_x = _scalar(data[128:160])
    t_xb = _scalar(data[160:192])
    e_b = _scalar(data[192:224])
    if t_x is None or t_xb is None or e_b is None:
        return None
    L, R = [], []
    off = 224
    for _ in range(rounds):
        L.append(data[off : off + 32])
        R.append(data[off + 32 : off + 64])
        off += 64
    a = _scalar(data[off : off + 32])
    b = _scalar(data[off + 32 : off + 64])
    if a is None or b is None:
        return None
    return RangeProof2(A, S, T1, T2, t_x, t_xb, e_b, L, R, a, b)


def write_range_proof(p: RangeProof2) -> bytes:
    out = bytearray()
    for pt in (p.A, p.S, p.T_1, p.T_2):
        assert len(pt) == 32
        out += pt
    for s in (p.t_x, p.t_x_blinding, p.e_blinding):
        out += int(s).to_bytes(32, "little")
    for l, r in zip(p.L, p.R):
        out += l
        out += r
    out += int(p.a).to_bytes(32, "little")
    out += int(p.b).to_bytes(32, "little")
    return bytes(out)
