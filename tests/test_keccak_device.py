"""Differential tests: device Keccak/STROBE vs the host wire model.

The host tier (models/strobe.py) is validated against merlin's published
vector; the device tier must agree byte-for-byte on every operation so the
on-device bulletproofs transcript produces identical challenges.
"""

from __future__ import annotations

import os

import numpy as np
import jax.numpy as jnp

from libzkp_tpu.models.strobe import Strobe128, Transcript
from libzkp_tpu.ops import keccak_device as kd
from libzkp_tpu.ops.keccak import keccak_f1600_bytes_py


B = 16


def _state_bytes(s: kd.StrobeDevice, lane: int) -> bytes:
    out = bytearray()
    for w in s.state:
        v = int(np.asarray(w.reshape(s.B))[lane])
        out += v.to_bytes(4, "little")
    return bytes(out)


def _to_dev(data: bytes, B: int = B):
    """Per-lane distinct data: lane b gets data rotated by b."""
    arr = np.zeros((len(data), B), dtype=np.uint32)
    for b in range(B):
        rot = bytes((x + b) & 0xFF for x in data)
        arr[:, b] = np.frombuffer(rot, dtype=np.uint8)
    return jnp.asarray(arr)


def test_keccak_permutation_matches_host():
    rng = np.random.default_rng(3)
    raw = rng.integers(0, 256, 200, dtype=np.uint8).tobytes()
    words = np.frombuffer(raw, dtype="<u4")
    state = [jnp.broadcast_to(jnp.uint32(int(w)), (8, B // 8)).copy() for w in words]
    out = kd.keccak_f1600_device(state)
    got = b"".join(
        int(np.asarray(w.reshape(B))[5]).to_bytes(4, "little") for w in out
    )
    want = bytearray(raw)
    keccak_f1600_bytes_py(want)
    assert got == bytes(want)


def test_strobe_lane_constant_ops_match_host():
    hd = kd.StrobeDevice(b"test proto", B)
    hh = Strobe128(b"test proto")
    hd.meta_ad(b"hello", False)
    hh.meta_ad(b"hello", False)
    hd.ad(b"world" * 40, False)  # crosses the rate boundary
    hh.ad(b"world" * 40, False)
    assert _state_bytes(hd, 0) == bytes(hh.state)
    # PRF output agreement
    dev = np.asarray(hd.prf(32))
    host = hh.prf(32, False)
    assert bytes(dev[:, 0].astype(np.uint8).tolist()) == host
    assert _state_bytes(hd, 3) == bytes(hh.state)


def test_strobe_per_lane_data_diverges_and_matches():
    data = bytes(range(48))
    hd = kd.TranscriptDevice(b"proto", B)
    hd.append_message(b"m", _to_dev(data))
    ch_dev = np.asarray(hd.challenge_bytes(b"c", 64))
    for lane in (0, 1, 7, 15):
        hh = Transcript(b"proto")
        rot = bytes((x + lane) & 0xFF for x in data)
        hh.append_message(b"m", rot)
        want = hh.challenge_bytes(b"c", 64)
        got = bytes(ch_dev[:, lane].astype(np.uint8).tolist())
        assert got == want, f"lane {lane}"


def test_transcript_schedule_rangeproof_prefix():
    """The first bulletproofs transcript ops match the host Transcript."""
    hd = kd.TranscriptDevice(b"libzkp_range_min", B)
    ht = Transcript(b"libzkp_range_min")
    hd.append_message(b"dom-sep", b"rangeproof v1")
    ht.append_message(b"dom-sep", b"rangeproof v1")
    hd.append_u64(b"n", 64)
    ht.append_u64(b"n", 64)
    hd.append_u64(b"m", 1)
    ht.append_u64(b"m", 1)
    V = os.urandom(32)
    hd.append_message(b"V", _to_dev(V))
    c_dev = np.asarray(hd.challenge_bytes(b"y", 64))
    for lane in (0, 5):
        t2 = Transcript(b"libzkp_range_min")
        t2.append_message(b"dom-sep", b"rangeproof v1")
        t2.append_u64(b"n", 64)
        t2.append_u64(b"m", 1)
        t2.append_message(b"V", bytes((x + lane) & 0xFF for x in V))
        want = t2.challenge_bytes(b"y", 64)
        assert bytes(c_dev[:, lane].astype(np.uint8).tolist()) == want
