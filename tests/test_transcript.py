"""Merlin/STROBE transcript: bit-exact vs the merlin crate's test vector."""

import hashlib

from libzkp_tpu.models.strobe import Strobe128, Transcript
from libzkp_tpu.ops.keccak import keccak_f1600_bytes


def test_keccak_f1600_via_sha3():
    """Validate the permutation by building SHA3-256 from it."""

    def sha3_256(data: bytes) -> bytes:
        rate = 136
        st = bytearray(200)
        msg = bytearray(data) + b"\x06"
        msg += b"\x00" * ((-len(msg)) % rate)
        msg[-1] |= 0x80
        for off in range(0, len(msg), rate):
            for i in range(rate):
                st[i] ^= msg[off + i]
            keccak_f1600_bytes(st)
        return bytes(st[:32])

    for data in [b"", b"abc", b"x" * 200, bytes(range(137))]:
        assert sha3_256(data) == hashlib.sha3_256(data).digest()


def test_merlin_published_vector():
    """The transcript equivalence vector from merlin's test suite."""
    t = Transcript(b"test protocol")
    t.append_message(b"some label", b"some data")
    cb = t.challenge_bytes(b"challenge", 32)
    assert cb.hex() == (
        "d5a21972d0d5fe320c0d263fac7fffb8145aa640af6e9bca177c03c7efcf0615"
    )


def test_transcript_determinism_and_sensitivity():
    def run(label, msg):
        t = Transcript(label)
        t.append_message(b"m", msg)
        return t.challenge_bytes(b"c", 64)

    assert run(b"a", b"x") == run(b"a", b"x")
    assert run(b"a", b"x") != run(b"a", b"y")
    assert run(b"a", b"x") != run(b"b", b"x")


def test_append_u64():
    t1 = Transcript(b"p")
    t1.append_u64(b"n", 64)
    t2 = Transcript(b"p")
    t2.append_message(b"n", (64).to_bytes(8, "little"))
    assert t1.challenge_bytes(b"c", 16) == t2.challenge_bytes(b"c", 16)
