"""Clean-room second parser for the winterfell 0.10 proof container.

Written independently from the layout specification in ``docs/INTEROP.md``
§"STARK container" (the component/bytes table) — deliberately NOT from
``libzkp_tpu/models/winterfell_wire.py`` — so the two implementations form a
differential pair: any transcription slip between the documented layout and
either implementation shows up as a mismatch in
``tests/test_winterfell_differential.py``.

This addresses the golden-vector gap for the container pin points
(TraceInfo field widths, partition-option bytes, per-query node partition,
vint64 encoding): with no Rust toolchain in the environment, the layout is
double-implemented and differentially tested instead (VERDICT round-3 #5).

Reference for the layout semantics: /root/reference/src/backend/stark.rs
(ProofOptions at :87-104, verify acceptance at :188-212); the container
itself is the winterfell 0.10 ``Proof`` component order.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Tuple


class ParseError(Exception):
    pass


class Reader:
    def __init__(self, data: bytes):
        self.d = data
        self.pos = 0

    def take(self, n: int) -> bytes:
        if self.pos + n > len(self.d):
            raise ParseError(f"short read: want {n} at {self.pos}")
        out = self.d[self.pos : self.pos + n]
        self.pos += n
        return out

    def u8(self) -> int:
        return self.take(1)[0]

    def u16(self) -> int:
        return int.from_bytes(self.take(2), "little")

    def u64(self) -> int:
        return int.from_bytes(self.take(8), "little")

    def vint(self) -> int:
        """winter-utils write_usize: value stored as (value << L) | (1 << (L-1))
        over the minimal L little-endian bytes; L-1 = index of the lowest set
        bit of the first byte."""
        first = self.d[self.pos] if self.pos < len(self.d) else None
        if first is None:
            raise ParseError("short vint")
        if first == 0:
            raise ParseError("vint with zero first byte (no length bit)")
        L = 1
        while not (first >> (L - 1)) & 1:
            L += 1
        enc = int.from_bytes(self.take(L), "little")
        marker = 1 << (L - 1)
        if enc & ((1 << L) - 1) != marker:
            raise ParseError("vint low bits are not the length marker")
        return enc >> L

    def done(self) -> bool:
        return self.pos == len(self.d)


@dataclass
class Queries2:
    nodes: bytes
    values: bytes


@dataclass
class Proof2:
    main_width: int
    aux_width: int
    aux_rands: int
    trace_length: int
    meta: bytes
    modulus: bytes
    num_queries: int
    blowup: int
    grinding: int
    field_extension: int
    fri_folding: int
    fri_max_remainder: int
    partition_count: int
    partition_hash_rate: int
    num_unique_queries: int
    trace_root: bytes
    constraint_root: bytes
    fri_roots: List[bytes]
    trace_queries: List[Queries2]
    constraint_queries: Queries2
    ood_trace: bytes
    ood_evals: bytes
    fri_layers: List[Tuple[bytes, bytes]]
    fri_remainder: bytes
    fri_partitions: int
    pow_nonce: int


def parse(data: bytes) -> Proof2:
    r = Reader(data)
    # -- Context: TraceInfo ---------------------------------------------------
    main_width = r.vint()
    aux_width = r.vint()
    aux_rands = r.vint()
    trace_length = r.vint()
    meta_len = r.u16()
    meta = r.take(meta_len)
    # -- Context: field modulus ----------------------------------------------
    mod_len = r.u8()
    modulus = r.take(mod_len)
    # -- Context: ProofOptions (6 numeric bytes + 2 partition bytes) ---------
    num_queries = r.u8()
    blowup = r.u8()
    grinding = r.u8()
    field_extension = r.u8()
    fri_folding = r.u8()
    fri_max_remainder = r.u8()
    partition_count = r.u8()
    partition_hash_rate = r.u8()
    # -- num unique queries ---------------------------------------------------
    num_unique_queries = r.u8()
    # -- Commitments ----------------------------------------------------------
    comm_len = r.vint()
    comm = Reader(r.take(comm_len))
    trace_root = comm.take(32)
    constraint_root = comm.take(32)
    fri_roots = []
    while not comm.done():
        fri_roots.append(comm.take(32))
    # -- trace queries: Vec<Queries> ------------------------------------------
    nseg = r.vint()
    trace_queries = []
    for _ in range(nseg):
        nodes = r.take(r.vint())
        values = r.take(r.vint())
        trace_queries.append(Queries2(nodes=nodes, values=values))
    # -- constraint queries ---------------------------------------------------
    cq = Queries2(nodes=r.take(r.vint()), values=r.take(r.vint()))
    # -- OodFrame -------------------------------------------------------------
    ood_trace = r.take(r.vint())
    ood_evals = r.take(r.vint())
    # -- FriProof -------------------------------------------------------------
    nlayers = r.vint()
    fri_layers = []
    for _ in range(nlayers):
        values = r.take(r.vint())
        nodes = r.take(r.vint())
        fri_layers.append((values, nodes))
    fri_remainder = r.take(r.vint())
    fri_partitions = r.u8()
    # -- pow nonce ------------------------------------------------------------
    pow_nonce = r.u64()
    if not r.done():
        raise ParseError(f"{len(r.d) - r.pos} trailing bytes")
    return Proof2(
        main_width=main_width,
        aux_width=aux_width,
        aux_rands=aux_rands,
        trace_length=trace_length,
        meta=meta,
        modulus=modulus,
        num_queries=num_queries,
        blowup=blowup,
        grinding=grinding,
        field_extension=field_extension,
        fri_folding=fri_folding,
        fri_max_remainder=fri_max_remainder,
        partition_count=partition_count,
        partition_hash_rate=partition_hash_rate,
        num_unique_queries=num_unique_queries,
        trace_root=trace_root,
        constraint_root=constraint_root,
        fri_roots=fri_roots,
        trace_queries=trace_queries,
        constraint_queries=cq,
        ood_trace=ood_trace,
        ood_evals=ood_evals,
        fri_layers=fri_layers,
        fri_remainder=fri_remainder,
        fri_partitions=fri_partitions,
        pow_nonce=pow_nonce,
    )


def _vint(value: int) -> bytes:
    L = 1
    while (value << L) | (1 << (L - 1)) >= 1 << (8 * L):
        L += 1
    return ((value << L) | (1 << (L - 1))).to_bytes(L, "little")


def serialize(p: Proof2) -> bytes:
    """Independent writer: Proof2 -> container bytes (round-trip check)."""
    out = bytearray()
    out += _vint(p.main_width)
    out += _vint(p.aux_width)
    out += _vint(p.aux_rands)
    out += _vint(p.trace_length)
    out += len(p.meta).to_bytes(2, "little")
    out += p.meta
    out += bytes([len(p.modulus)])
    out += p.modulus
    out += bytes(
        [
            p.num_queries,
            p.blowup,
            p.grinding,
            p.field_extension,
            p.fri_folding,
            p.fri_max_remainder,
            p.partition_count,
            p.partition_hash_rate,
            p.num_unique_queries,
        ]
    )
    comm = p.trace_root + p.constraint_root + b"".join(p.fri_roots)
    out += _vint(len(comm))
    out += comm
    out += _vint(len(p.trace_queries))
    for q in p.trace_queries:
        out += _vint(len(q.nodes))
        out += q.nodes
        out += _vint(len(q.values))
        out += q.values
    out += _vint(len(p.constraint_queries.nodes))
    out += p.constraint_queries.nodes
    out += _vint(len(p.constraint_queries.values))
    out += p.constraint_queries.values
    out += _vint(len(p.ood_trace))
    out += p.ood_trace
    out += _vint(len(p.ood_evals))
    out += p.ood_evals
    out += _vint(len(p.fri_layers))
    for values, nodes in p.fri_layers:
        out += _vint(len(values))
        out += values
        out += _vint(len(nodes))
        out += nodes
    out += _vint(len(p.fri_remainder))
    out += p.fri_remainder
    out += bytes([p.fri_partitions])
    out += p.pow_nonce.to_bytes(8, "little")
    return bytes(out)
