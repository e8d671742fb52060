"""Winterfell 0.10 proof container (emit + parse).

The reference verifies scheme-5 proofs with ``winterfell::verify``
(``/root/reference/src/backend/stark.rs:188-212``), so byte interop requires
this library's STARK bytes to BE a winterfell ``Proof``. This module encodes
and decodes that container component-for-component:

    Proof := Context
           ‖ num_unique_queries: u8
           ‖ Commitments
           ‖ Vec<Queries>           (one per trace segment; we have 1)
           ‖ Queries                (constraint composition segment)
           ‖ OodFrame
           ‖ FriProof
           ‖ pow_nonce: u64 LE

Field map (winterfell 0.10 source structure -> bytes). Confidence notes:
every row is implemented as documented; rows marked (gv) are the places a
cross-implementation golden vector pins the last mile — the component
order and the self-delimiting structure let any such pin land as a local
one-line change:

| component    | layout                                                     |
|--------------|------------------------------------------------------------|
| usize        | vint64: L = min bytes with value < 2^(7L);                 |
|              | enc = (value << L) | (1 << (L-1)), L little-endian bytes;  |
|              | L = 9 -> 0x00 prefix + 8 raw LE bytes                      |
| TraceInfo    | usize main_width ‖ usize aux_width(0) ‖ usize aux_rands(0) |
|              | ‖ usize trace_length ‖ u16 meta_len(0) ‖ meta   (gv)       |
| Context      | TraceInfo ‖ u8 modulus_len ‖ modulus LE bytes ‖ Options    |
| ProofOptions | u8 num_queries ‖ u8 blowup ‖ u8 grinding ‖ u8 field_ext    |
|              | (None=1) ‖ u8 fri_folding ‖ u8 fri_max_remainder_degree    |
|              | ‖ u8 num_partitions(1) ‖ u8 hash_rate(1)        (gv)       |
| Commitments  | usize total_bytes ‖ trace_root ‖ constraint_root ‖         |
|              | fri_layer_roots...  (32 B digests, Blake3_256)             |
| Queries      | usize paths_len ‖ BatchMerkleProof nodes ‖ usize values_len|
|              | ‖ row values (16 B LE f128 elements, row-major,            |
|              | positions ascending)                            (gv)      |
| BatchProof   | u8 depth ‖ per query (ascending positions): u8 node_count  |
|              | ‖ that query's not-yet-derivable sibling digests,          |
|              | bottom-up                                        (gv)      |
| OodFrame     | usize len ‖ trace states (current row ‖ next row elements) |
|              | ‖ usize len ‖ composition column evaluations at z          |
| FriProof     | usize layer_count ‖ layers ‖ usize remainder_len ‖         |
|              | remainder poly coefficients (elements) ‖ u8 partitions(1)  |
| FriProofLayer| usize values_len ‖ folded row values ‖ usize paths_len ‖   |
|              | BatchMerkleProof nodes                                     |
| pow_nonce    | u64 LE                                                     |

The random-coin schedule (``models/random_coin.py``) mirrors
``DefaultRandomCoin<Blake3_256>`` (seed = hash(context), reseed = merge,
draw = hash(seed ‖ counter_le8) with rejection sampling); the draw sites
follow winterfell's prover order (trace root -> constraint coefficients,
constraint root -> z, OOD digest -> DEEP coefficients, per-FRI-layer roots
-> folding challenges, remainder -> PoW -> positions).
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple


# ---------------------------------------------------------------------------
# vint64 usize codec (winter-utils ByteWriter::write_usize)
# ---------------------------------------------------------------------------


def write_usize(buf: bytearray, value: int) -> None:
    assert value >= 0
    for length in range(1, 9):
        if value < 1 << (7 * length):
            enc = (value << length) | (1 << (length - 1))
            buf += enc.to_bytes(length, "little")
            return
    buf += b"\x00" + value.to_bytes(8, "little")


def read_usize(data: bytes, pos: int) -> Tuple[int, int]:
    """Returns (value, new_pos); raises on truncation."""
    first = data[pos]
    if first == 0:
        value = int.from_bytes(data[pos + 1 : pos + 9], "little")
        if len(data) < pos + 9:
            raise ValueError("truncated usize")
        return value, pos + 9
    length = (first & -first).bit_length()  # trailing_zeros + 1
    if len(data) < pos + length:
        raise ValueError("truncated usize")
    enc = int.from_bytes(data[pos : pos + length], "little")
    return enc >> length, pos + length


def _write_byte_vec(buf: bytearray, data: bytes) -> None:
    write_usize(buf, len(data))
    buf += data


def _read_byte_vec(data: bytes, pos: int) -> Tuple[bytes, int]:
    n, pos = read_usize(data, pos)
    if len(data) < pos + n:
        raise ValueError("truncated byte vec")
    return data[pos : pos + n], pos + n


# ---------------------------------------------------------------------------
# batched Merkle openings (winter-crypto BatchMerkleProof)
# ---------------------------------------------------------------------------


def _coverage(positions, depth: int) -> List[set]:
    """cov[level] = subtree indices at that level containing a queried leaf."""
    cov = []
    cur = set(positions)
    for _ in range(depth + 1):
        cov.append(cur)
        cur = {i >> 1 for i in cur}
    return cov


def batch_proof_nodes(tree, positions: Sequence[int]) -> bytes:
    """Serialize the batched opening for ``positions`` (sorted ascending).

    Per-query partition: walking each query's sibling path bottom-up, a
    sibling node is skipped when its subtree contains any queried leaf (the
    verifier derives it from that query's own materials) or when an earlier
    query already provided it; otherwise it is emitted under the current
    query. Every emitted node is consumed in the root recomputation — no
    provided byte escapes the integrity check.
    """
    positions = sorted(set(positions))
    depth = tree.depth
    cov = _coverage(positions, depth)
    out = bytearray([depth])
    emitted = set()
    for q in positions:
        nodes: List[bytes] = []
        idx = q
        for level in range(depth):
            sib = idx ^ 1
            if sib not in cov[level] and (level, sib) not in emitted:
                nodes.append(tree.levels[level][sib])
                emitted.add((level, sib))
            idx >>= 1
        out.append(len(nodes))
        for node in nodes:
            out += node
    return bytes(out)


def batch_proof_verify(
    root: bytes,
    depth: int,
    positions: Sequence[int],
    leaves: Sequence[bytes],
    nodes_blob: bytes,
) -> bool:
    """Dual of :func:`batch_proof_nodes`: recompute the root from per-query
    node lists and the queried leaf digests."""
    from ..ops.blake3 import merge_digests

    positions = list(positions)
    if len(leaves) != len(positions):
        return False
    try:
        if nodes_blob[0] != depth:
            return False
        pos = 1
        per_query: List[List[bytes]] = []
        for _ in positions:
            cnt = nodes_blob[pos]
            pos += 1
            nodes = []
            for _ in range(cnt):
                nodes.append(nodes_blob[pos : pos + 32])
                if len(nodes[-1]) != 32:
                    return False
                pos += 32
            per_query.append(nodes)
        if pos != len(nodes_blob):
            return False
        # replay emission order to place each provided node
        cov = _coverage(positions, depth)
        emitted = {}
        for qi, q in enumerate(positions):
            it = iter(per_query[qi])
            idx = q
            for level in range(depth):
                sib = idx ^ 1
                if sib not in cov[level] and (level, sib) not in emitted:
                    emitted[(level, sib)] = next(it, None)
                    if emitted[(level, sib)] is None:
                        return False
                idx >>= 1
            if next(it, None) is not None:
                return False  # extra nodes
        # bottom-up: at each level every path node's sibling is known
        # (queried, emitted, or derived), so parents pair off exactly
        levels: List[dict] = [dict() for _ in range(depth + 1)]
        for q, leaf in zip(positions, leaves):
            levels[0][q] = bytes(leaf)
        for (lv, idx), dg in emitted.items():
            levels[lv][idx] = dg
        for lv in range(depth):
            cur = levels[lv]
            nxt = levels[lv + 1]
            for idx, dg in cur.items():
                if idx & 1:
                    continue
                sib = cur.get(idx + 1)
                if sib is not None:
                    nxt[idx >> 1] = merge_digests(dg, sib)
        return levels[depth].get(0) == bytes(root)
    except (IndexError, ValueError):
        return False


# ---------------------------------------------------------------------------
# component emitters / parsers
# ---------------------------------------------------------------------------


FIELD_EXT_NONE = 1


def write_context(
    buf: bytearray, width: int, trace_length: int, modulus: int, opts
) -> None:
    # TraceInfo
    write_usize(buf, width)
    write_usize(buf, 0)  # aux segment width
    write_usize(buf, 0)  # aux segment rands
    write_usize(buf, trace_length)
    buf += (0).to_bytes(2, "little")  # meta length u16
    # field modulus
    nbytes = (modulus.bit_length() + 7) // 8
    buf.append(nbytes)
    buf += modulus.to_bytes(nbytes, "little")
    # ProofOptions
    buf += bytes(
        [
            opts.num_queries,
            opts.blowup,
            opts.grinding,
            FIELD_EXT_NONE,
            opts.folding,
            opts.max_remainder_degree,
            1,  # partition count
            1,  # partition hash rate
        ]
    )


def read_context(data: bytes, pos: int):
    """Returns (width, trace_length, modulus, options_tuple, new_pos)."""
    width, pos = read_usize(data, pos)
    aux_w, pos = read_usize(data, pos)
    aux_r, pos = read_usize(data, pos)
    trace_length, pos = read_usize(data, pos)
    if aux_w or aux_r:
        raise ValueError("aux segments unsupported")
    meta_len = int.from_bytes(data[pos : pos + 2], "little")
    pos += 2 + meta_len
    nbytes = data[pos]
    pos += 1
    modulus = int.from_bytes(data[pos : pos + nbytes], "little")
    pos += nbytes
    o = data[pos : pos + 8]
    # AcceptableOptions compares the FULL ProofOptions, partition options
    # included (we emit the single-partition default).
    if len(o) != 8 or o[3] != FIELD_EXT_NONE or o[6] != 1 or o[7] != 1:
        raise ValueError("bad options")
    pos += 8
    return width, trace_length, modulus, (o[0], o[1], o[2], o[4], o[5]), pos


def write_commitments(buf: bytearray, roots: Sequence[bytes]) -> None:
    blob = b"".join(roots)
    write_usize(buf, len(blob))
    buf += blob


def read_commitments(data: bytes, pos: int, num_fri: int):
    blob, pos = _read_byte_vec(data, pos)
    if len(blob) != 32 * (2 + num_fri):
        raise ValueError("bad commitment count")
    roots = [blob[i * 32 : (i + 1) * 32] for i in range(2 + num_fri)]
    return roots[0], roots[1], roots[2:], pos


def write_queries(buf: bytearray, paths: bytes, values: bytes) -> None:
    _write_byte_vec(buf, paths)
    _write_byte_vec(buf, values)


def read_queries(data: bytes, pos: int) -> Tuple[bytes, bytes, int]:
    paths, pos = _read_byte_vec(data, pos)
    values, pos = _read_byte_vec(data, pos)
    return paths, values, pos


def write_ood_frame(buf: bytearray, trace_states: bytes, evaluations: bytes) -> None:
    _write_byte_vec(buf, trace_states)
    _write_byte_vec(buf, evaluations)


def read_ood_frame(data: bytes, pos: int) -> Tuple[bytes, bytes, int]:
    ts, pos = _read_byte_vec(data, pos)
    ev, pos = _read_byte_vec(data, pos)
    return ts, ev, pos


def write_fri_proof(
    buf: bytearray, layers: Sequence[Tuple[bytes, bytes]], remainder: bytes
) -> None:
    """layers: [(values_bytes, paths_bytes)]; remainder: coefficient bytes."""
    write_usize(buf, len(layers))
    for values, paths in layers:
        _write_byte_vec(buf, values)
        _write_byte_vec(buf, paths)
    _write_byte_vec(buf, remainder)
    buf.append(1)  # num_partitions


def read_fri_proof(data: bytes, pos: int):
    count, pos = read_usize(data, pos)
    if count > 64:
        raise ValueError("implausible FRI layer count")
    layers = []
    for _ in range(count):
        values, pos = _read_byte_vec(data, pos)
        paths, pos = _read_byte_vec(data, pos)
        layers.append((values, paths))
    remainder, pos = _read_byte_vec(data, pos)
    if data[pos] != 1:
        raise ValueError("unsupported partition count")
    pos += 1
    return layers, remainder, pos
