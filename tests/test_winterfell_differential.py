"""Differential tests: winterfell 0.10 container, two independent codecs.

``tests/wf_parser2.py`` re-implements the container layout clean-room from
the ``docs/INTEROP.md`` §"STARK container" table; production bytes come from
``models/winterfell_wire.py``. Agreement pins the documented layout against
both implementations — the no-Rust-toolchain substitute for real golden
vectors (VERDICT round-3 #5). The reference acceptance path these bytes are
structured for is ``winterfell::verify`` + ``AcceptableOptions``
(/root/reference/src/backend/stark.rs:188-212).
"""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(__file__))

import wf_parser2
from libzkp_tpu import api as zkp
from libzkp_tpu.models import winterfell_wire as wire
from libzkp_tpu.utils.envelope import Proof


def _stark_bytes(old: int, new: int) -> bytes:
    env = Proof.from_bytes(zkp.prove_improvement(old, new))
    assert env.scheme == 5
    return bytes(env.proof[16:])  # payload = old u64 | new u64 | container


@pytest.mark.parametrize("old,new", [(30, 50), (1, 8), (0, 1), (2**32, 2**40)])
def test_container_parses_identically(old, new):
    data = _stark_bytes(old, new)
    p2 = wf_parser2.parse(data)

    # Context values the reference's AcceptableOptions pins
    # (stark.rs:87-104,199-212): ProofOptions(32, 8, 0, None, 8, 31).
    assert p2.main_width == 1
    assert p2.aux_width == 0 and p2.aux_rands == 0
    assert p2.trace_length == 8
    assert p2.meta == b""
    assert int.from_bytes(p2.modulus, "little") == 2**128 - 45 * 2**40 + 1
    assert (p2.num_queries, p2.blowup, p2.grinding) == (32, 8, 0)
    assert p2.field_extension == wire.FIELD_EXT_NONE
    assert (p2.fri_folding, p2.fri_max_remainder) == (8, 31)
    assert (p2.partition_count, p2.partition_hash_rate) == (1, 1)
    assert 1 <= p2.num_unique_queries <= 32
    assert len(p2.trace_root) == 32 and len(p2.constraint_root) == 32

    # degenerate FRI shape at trace length 8: no folding layers, remainder
    # is the whole domain polynomial (coefficients of 16-byte elements)
    assert p2.fri_layers == []
    assert len(p2.fri_roots) == 0
    assert len(p2.fri_remainder) % 16 == 0
    assert p2.fri_partitions == 1

    # production reader agrees with the clean-room parser field-for-field
    w, tl, mod, opts, pos = wire.read_context(data, 0)
    assert (w, tl) == (p2.main_width, p2.trace_length)
    assert mod == int.from_bytes(p2.modulus, "little")
    assert opts == (
        p2.num_queries,
        p2.blowup,
        p2.grinding,
        p2.fri_folding,
        p2.fri_max_remainder,
    )
    assert data[pos] == p2.num_unique_queries

    # row values are 16-byte LE f128 elements
    for q in p2.trace_queries:
        assert len(q.values) % 16 == 0
    assert len(p2.constraint_queries.values) % 16 == 0
    assert len(p2.ood_trace) == 2 * 16  # current row + next row, width 1
    assert len(p2.ood_evals) % 16 == 0


@pytest.mark.parametrize("old,new", [(30, 50), (7, 9)])
def test_container_reserializes_byte_exact(old, new):
    data = _stark_bytes(old, new)
    p2 = wf_parser2.parse(data)
    assert wf_parser2.serialize(p2) == data


def test_vint64_encodings_agree():
    values = [0, 1, 2, 63, 64, 127, 128, 255, 256, 2**14 - 1, 2**14,
              2**21 - 1, 2**21, 2**28, 12345678]
    for v in values:
        buf = bytearray()
        wire.write_usize(buf, v)
        r = wf_parser2.Reader(bytes(buf))
        assert r.vint() == v, v
        assert r.done(), v
        # and the clean-room writer emits the same bytes
        assert wf_parser2._vint(v) == bytes(buf), v


def test_vint64_rejects_malformed():
    r = wf_parser2.Reader(b"\x00")
    with pytest.raises(wf_parser2.ParseError):
        r.vint()


def test_tampered_container_still_parses_or_fails_closed():
    """Structural tamper: parser2 either raises ParseError or returns a
    structure whose re-serialization differs — it never silently 'fixes'
    bytes (mirrors the never-throw-but-reject verify discipline)."""
    data = _stark_bytes(30, 50)
    for pos in range(0, len(data), 37):
        bad = bytearray(data)
        bad[pos] ^= 0x01
        try:
            p2 = wf_parser2.parse(bytes(bad))
        except wf_parser2.ParseError:
            continue
        assert wf_parser2.serialize(p2) == bytes(bad)
