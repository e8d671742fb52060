"""Batched Keccak-f[1600] + STROBE-128 transcript on device.

The missing middle of the whole-pipeline on-device bulletproofs prover
(VERDICT r4 #2): device MSM and device Ristretto codec exist; this supplies
the Merlin/STROBE Fiat–Shamir layer so an entire proof batch can advance
lockstep on-chip with zero host round-trips per transcript operation.

Design:

* State: 25 Keccak lanes × 64 bits as 50 uint32 words, each word a
  ``(8, B//8)`` array (the 2-D retiling that took the BLAKE3 kernel from
  0.05 % to ~40 % of VPU peak — 1-D ``(B,)`` words waste 7/8 sublanes).
* The STROBE schedule is STATIC for a batch of same-shape instances: every
  absorb/squeeze position, flag byte and permutation point is a Python int
  at trace time, so :class:`StrobeDevice` unrolls to straight-line XLA with
  data-dependent VALUES only — mirroring ``models/strobe.py`` op-for-op
  (validated by the differential tests in tests/test_keccak_device.py).
* Byte-granular absorb/squeeze on uint32 words via static shift/mask.

Replaces the ``merlin`` crate consumption of the reference
(``/root/reference/src/backend/bulletproofs.rs:6,137-149``) on the device
tier; the host tier (models/strobe.py) remains the wire-authoritative model.
"""

from __future__ import annotations

import functools
from typing import List, Sequence

import numpy as np

from .keccak import ROUND_CONSTANTS, ROTATION
from .limbfold import backend_cached

STROBE_R = 166

FLAG_I = 1
FLAG_A = 1 << 1
FLAG_C = 1 << 2
FLAG_T = 1 << 3
FLAG_M = 1 << 4
FLAG_K = 1 << 5


def _jnp():
    import jax.numpy as jnp

    return jnp


# ---------------------------------------------------------------------------
# Keccak-f[1600] on (hi, lo) uint32 word pairs
# ---------------------------------------------------------------------------


def _rotl64(hi, lo, s: int):
    """64-bit rotate-left by static s on (hi, lo) uint32 pairs."""
    s %= 64
    if s == 0:
        return hi, lo
    if s == 32:
        return lo, hi
    if s > 32:
        hi, lo = lo, hi
        s -= 32
    # 0 < s < 32
    nh = (hi << s) | (lo >> (32 - s))
    nl = (lo << s) | (hi >> (32 - s))
    return nh, nl


def keccak_f1600_device(state: List):
    """Permute 50 uint32 word arrays (lane i = words [2i] lo, [2i+1] hi).

    ``state``: list of 50 arrays (same shape each, uint32). Returns the
    permuted list. Word order matches the byte-LE state layout:
    state[2*i] = low 32 bits of Keccak lane i, state[2*i+1] = high.
    """
    a = list(state)

    def lane(i):
        return a[2 * i + 1], a[2 * i]  # (hi, lo)

    def set_lane(i, hi, lo):
        a[2 * i + 1], a[2 * i] = hi, lo

    for rc in ROUND_CONSTANTS:
        # theta
        c = []
        for x in range(5):
            hi, lo = lane(x)
            for y in range(1, 5):
                h2, l2 = lane(x + 5 * y)
                hi, lo = hi ^ h2, lo ^ l2
            c.append((hi, lo))
        d = []
        for x in range(5):
            h1, l1 = c[(x - 1) % 5]
            h2, l2 = _rotl64(*c[(x + 1) % 5], 1)
            d.append((h1 ^ h2, l1 ^ l2))
        for x in range(5):
            dh, dl = d[x]
            for y in range(5):
                hi, lo = lane(x + 5 * y)
                set_lane(x + 5 * y, hi ^ dh, lo ^ dl)
        # rho + pi
        b = [None] * 25
        for x in range(5):
            for y in range(5):
                hi, lo = _rotl64(*lane(x + 5 * y), ROTATION[x][y])
                b[y + 5 * ((2 * x + 3 * y) % 5)] = (hi, lo)
        # chi
        for x in range(5):
            for y in range(5):
                h0, l0 = b[x + 5 * y]
                h1, l1 = b[(x + 1) % 5 + 5 * y]
                h2, l2 = b[(x + 2) % 5 + 5 * y]
                set_lane(x + 5 * y, h0 ^ (~h1 & h2), l0 ^ (~l1 & l2))
        # iota
        hi, lo = lane(0)
        set_lane(0, hi ^ np.uint32(rc >> 32), lo ^ np.uint32(rc & 0xFFFFFFFF))
    return a


@backend_cached
def _phase_jit(_backend, statics, sig, const_msgs, B: int):
    """Compile one transcript phase; returns (jitted fn, meta with the
    post-phase (pos, pos_begin, cur_flags) captured at trace time).

    ``sig``: tuple of ("msg_const", label, None) / ("msg", label, L) /
    ("chal", label, nbytes); ``const_msgs``: the lane-constant message
    bytes in schedule order.
    """
    import jax

    pos0, begin0, flags0, shape = statics
    meta: dict = {}

    def replay(state_tuple, *data):
        st = StrobeDevice.__new__(StrobeDevice)
        st.B = B
        st.shape = shape
        st.state = list(state_tuple)
        st.pos, st.pos_begin, st.cur_flags = pos0, begin0, flags0
        t = TranscriptDevice.__new__(TranscriptDevice)
        t.strobe = st
        t.B = B
        chals = []
        d_it = iter(data)
        c_it = iter(const_msgs)
        for kind, label, spec in sig:
            if kind == "msg_const":
                t.append_message(label, next(c_it))
            elif kind == "msg":
                t.append_message(label, next(d_it))
            else:  # chal
                chals.append(t.challenge_bytes(label, spec))
        meta["post"] = (st.pos, st.pos_begin, st.cur_flags)
        return tuple(st.state), tuple(chals)

    from .blake3_device import _use_jit

    # jit still traces on the first call (only the backend compile is
    # cached), so meta["post"] is always populated before it is read.
    return (jax.jit(replay) if _use_jit() else replay), meta


@backend_cached
def _perm_jit(_backend=None):
    """Jitted permutation: ~7k-op graph compiled once per word shape —
    eager per-op dispatch of 24 unrolled rounds dominates otherwise.
    XLA:CPU compiles the unrolled graph pathologically (like the BLAKE3
    compress), so the CPU backend stays eager."""
    import jax

    from .blake3_device import _use_jit

    if not _use_jit():
        return lambda *words: tuple(keccak_f1600_device(list(words)))
    return jax.jit(lambda *words: tuple(keccak_f1600_device(list(words))))


# ---------------------------------------------------------------------------
# STROBE-128 with a static schedule over batched lanes
# ---------------------------------------------------------------------------


class StrobeDevice:
    """Lockstep STROBE-128 sponge over B lanes.

    All positions/flags are static Python state (identical across lanes, as
    for any same-shape proof batch); only absorbed/squeezed VALUES are
    device arrays. Data arrays are uint32 with one BYTE per entry, shape
    ``(B,)`` — or Python ``bytes`` for lane-constant data (labels).
    """

    def __init__(self, protocol_label: bytes, B: int):
        jnp = _jnp()
        self.B = B
        init = bytearray(200)
        init[0:6] = bytes([1, STROBE_R + 2, 1, 0, 1, 96])
        init[6:18] = b"STROBEv1.0.2"
        from .keccak import keccak_f1600_bytes

        keccak_f1600_bytes(init)
        words = np.frombuffer(bytes(init), dtype="<u4")
        shape = (8, B // 8) if B % 8 == 0 and B >= 8 else (B,)
        self.shape = shape
        self.state = [
            jnp.broadcast_to(jnp.uint32(int(w)), shape).copy() for w in words
        ]
        self.pos = 0
        self.pos_begin = 0
        self.cur_flags = 0
        self.meta_ad(protocol_label, False)

    @classmethod
    def from_states(cls, snapshots: Sequence[bytes]):
        """Resume B lockstep sponges from 203-byte ``Strobe128.state_bytes``
        snapshots. pos/pos_begin/cur_flags must agree across lanes (the
        schedule is static); callers group instances accordingly."""
        jnp = _jnp()
        B = len(snapshots)
        pos = snapshots[0][200]
        begin = snapshots[0][201]
        flags = snapshots[0][202]
        assert all(
            s[200] == pos and s[201] == begin and s[202] == flags
            for s in snapshots
        ), "mixed transcript positions in one device batch"
        self = cls.__new__(cls)
        self.B = B
        shape = (8, B // 8) if B % 8 == 0 and B >= 8 else (B,)
        self.shape = shape
        words = np.stack(
            [np.frombuffer(s[:200], dtype="<u4") for s in snapshots], axis=1
        )  # (50, B)
        self.state = [
            jnp.asarray(words[i].reshape(shape).astype(np.uint32))
            for i in range(50)
        ]
        self.pos = int(pos)
        self.pos_begin = int(begin)
        self.cur_flags = int(flags)
        return self

    # -- low-level ---------------------------------------------------------
    def _run_f(self) -> None:
        self._xor_byte(self.pos, int(self.pos_begin))
        self._xor_byte(self.pos + 1, 0x04)
        self._xor_byte(STROBE_R + 1, 0x80)
        self.state = list(_perm_jit()(*self.state))
        self.pos = 0
        self.pos_begin = 0

    def _xor_byte(self, p: int, v) -> None:
        """XOR one byte (static or device (B,)) into state position p."""
        jnp = _jnp()
        w, sh = p // 4, (p % 4) * 8
        if isinstance(v, int):
            if v == 0:
                return
            self.state[w] = self.state[w] ^ jnp.uint32(v << sh)
        else:
            self.state[w] = self.state[w] ^ (
                v.reshape(self.shape).astype(jnp.uint32) << sh
            )

    def _read_byte(self, p: int):
        jnp = _jnp()
        w, sh = p // 4, (p % 4) * 8
        return (self.state[w] >> sh) & jnp.uint32(0xFF)

    def _zero_byte(self, p: int) -> None:
        jnp = _jnp()
        w, sh = p // 4, (p % 4) * 8
        self.state[w] = self.state[w] & jnp.uint32(~(0xFF << sh) & 0xFFFFFFFF)

    def _absorb(self, data) -> None:
        """data: bytes (lane-constant) or (L, B) uint32 byte array."""
        if isinstance(data, (bytes, bytearray)):
            for byte in data:
                self._xor_byte(self.pos, int(byte))
                self._advance()
        else:
            for i in range(data.shape[0]):
                self._xor_byte(self.pos, data[i])
                self._advance()

    def _advance(self) -> None:
        self.pos += 1
        if self.pos == STROBE_R:
            self._run_f()

    def _squeeze(self, n: int):
        """-> (n, B) uint32 bytes (state bytes are zeroed, as STROBE PRF)."""
        jnp = _jnp()
        out = []
        for _ in range(n):
            out.append(self._read_byte(self.pos).reshape(self.B))
            self._zero_byte(self.pos)
            self._advance()
        return jnp.stack(out, axis=0)

    def _begin_op(self, flags: int, more: bool) -> None:
        if more:
            assert self.cur_flags == flags, "flag mismatch on more=True"
            return
        assert flags & FLAG_T == 0, "transport flags not supported"
        old_begin = self.pos_begin
        self.pos_begin = self.pos + 1
        self.cur_flags = flags
        self._absorb(bytes([old_begin, flags]))
        if flags & (FLAG_C | FLAG_K) and self.pos != 0:
            self._run_f()

    # -- operations (merlin subset) ----------------------------------------
    def meta_ad(self, data, more: bool) -> None:
        self._begin_op(FLAG_M | FLAG_A, more)
        self._absorb(data)

    def ad(self, data, more: bool) -> None:
        self._begin_op(FLAG_A, more)
        self._absorb(data)

    def prf(self, n: int, more: bool = False):
        self._begin_op(FLAG_I | FLAG_A | FLAG_C, more)
        return self._squeeze(n)


class TranscriptDevice:
    """Merlin v1.0 transcript over B lockstep lanes (models/strobe.Transcript
    with device-array message values)."""

    def __init__(self, label: bytes, B: int):
        self.strobe = StrobeDevice(b"Merlin v1.0", B)
        self.B = B
        self.append_message(b"dom-sep", label)

    @classmethod
    def from_transcripts(cls, transcripts) -> "TranscriptDevice":
        """Resume from per-lane host ``models.strobe.Transcript`` objects
        (equal positions required — group by protocol-label length)."""
        self = cls.__new__(cls)
        self.strobe = StrobeDevice.from_states(
            [t.strobe.state_bytes() for t in transcripts]
        )
        self.B = self.strobe.B
        return self

    def run_phase(self, ops):
        """Execute a batch of transcript ops as ONE jitted program.

        ``ops``: list of ``("msg", label, message)`` (message: bytes or an
        (L, B) device byte array) and ``("chal", label, nbytes)`` entries.
        Returns the challenge arrays in order. Eagerly dispatching the
        ~10^2 byte-level ops per phase costs ~ms each over the tunnel; one
        jit per (schedule, entry-position) is compiled once and cached.
        """
        import jax

        st = self.strobe
        statics = (st.pos, st.pos_begin, st.cur_flags, st.shape)
        sig = []
        const_msgs = []
        data = []
        for kind, label, m in ops:
            if kind == "msg" and isinstance(m, (bytes, bytearray)):
                sig.append(("msg_const", label, None))
                const_msgs.append(bytes(m))
            elif kind == "msg":
                sig.append(("msg", label, int(m.shape[0])))
                data.append(m)
            else:
                sig.append(("chal", label, int(m)))
        fn, meta = _phase_jit(
            statics, tuple(sig), tuple(const_msgs), self.B
        )
        new_state, chals = fn(tuple(st.state), *data)
        st.state = list(new_state)
        st.pos, st.pos_begin, st.cur_flags = meta["post"]
        return chals

    def append_message(self, label: bytes, message) -> None:
        """message: bytes (lane-constant) or (L, B) device byte array."""
        L = (
            len(message)
            if isinstance(message, (bytes, bytearray))
            else message.shape[0]
        )
        self.strobe.meta_ad(label + int(L).to_bytes(4, "little"), False)
        self.strobe.ad(message, False)

    def append_u64(self, label: bytes, value: int) -> None:
        self.append_message(label, int(value).to_bytes(8, "little"))

    def challenge_bytes(self, label: bytes, n: int):
        """-> (n, B) uint32 byte array."""
        self.strobe.meta_ad(label + int(n).to_bytes(4, "little"), False)
        return self.strobe.prf(n)
