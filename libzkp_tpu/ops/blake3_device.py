"""Device BLAKE3 tier: batched leaf hashing + Merkle levels as one jit.

Maps the STARK commit hot loop (Blake3 Merkle trees over LDE rows —
winterfell internals behind ``/root/reference/src/backend/stark.rs:110-111``)
onto the accelerator: the compression function vectorizes over leaves as
uint32 lanes on the VPU, and a whole power-of-two tree builds in log2(n)
fused compress rounds. Differentially tested against the pure-Python
specification model (:mod:`libzkp_tpu.ops.blake3`) and the C++ tier.

Measured numbers (vs the host C++ tier, this host's tunneled v5e) live in
BASELINE.md; engagement is opt-in via ``LIBZKP_DEVICE_HASH=1`` in
:func:`libzkp_tpu.models.merkle.hash_element_rows`.
"""

from __future__ import annotations

import functools
from typing import List, Sequence

import jax
import jax.numpy as jnp

from .blake3 import CHUNK_END, CHUNK_START, IV, MSG_PERMUTATION, PARENT, ROOT

_U32 = jnp.uint32


def _rotr(x, n):
    return (x >> n) | (x << (32 - n))


def _compress_vec(cv, m, counter: int, block_len: int, flags: int):
    """Vectorized BLAKE3 compress: cv (B, 8), m (B, 16) -> (B, 8) cv out.

    counter/block_len/flags are python ints (same for every lane).

    Each state/message word is held as an (8, B//8) 2-D array rather than a
    1-D (B,) vector: 1-D int32 arrays occupy one sublane of each (8, 128)
    VPU tile, so the word-parallel rotate/xor/add chains ran at ~1/8 of
    lane capacity (the 0.05 %-of-VPU row in BASELINE.md's round-4
    utilization table). The reshapes at entry/exit are 24 cheap relayouts
    against ~800 tile-ops of compression arithmetic.
    """
    B = cv.shape[0]
    two_d = B % 8 == 0 and B >= 8
    shape = (8, B // 8) if two_d else (B,)

    def w(x):
        return x.reshape(shape) if two_d else x

    consts = jnp.asarray(
        [IV[0], IV[1], IV[2], IV[3], counter & 0xFFFFFFFF,
         (counter >> 32) & 0xFFFFFFFF, block_len, flags],
        dtype=_U32,
    )
    state = [w(cv[:, i]) for i in range(8)] + [
        jnp.broadcast_to(consts[i], shape) for i in range(8)
    ]
    msg = [w(m[:, i]) for i in range(16)]

    def g(a, b, c, d, mx, my):
        state[a] = state[a] + state[b] + mx
        state[d] = _rotr(state[d] ^ state[a], 16)
        state[c] = state[c] + state[d]
        state[b] = _rotr(state[b] ^ state[c], 12)
        state[a] = state[a] + state[b] + my
        state[d] = _rotr(state[d] ^ state[a], 8)
        state[c] = state[c] + state[d]
        state[b] = _rotr(state[b] ^ state[c], 7)

    for r in range(7):
        g(0, 4, 8, 12, msg[0], msg[1])
        g(1, 5, 9, 13, msg[2], msg[3])
        g(2, 6, 10, 14, msg[4], msg[5])
        g(3, 7, 11, 15, msg[6], msg[7])
        g(0, 5, 10, 15, msg[8], msg[9])
        g(1, 6, 11, 12, msg[10], msg[11])
        g(2, 7, 8, 13, msg[12], msg[13])
        g(3, 4, 9, 14, msg[14], msg[15])
        if r < 6:
            msg = [msg[MSG_PERMUTATION[i]] for i in range(16)]
    return jnp.stack(
        [(state[i] ^ state[i + 8]).reshape(B) for i in range(8)], axis=1
    )


# Every hash in the Merkle tier is a STANDALONE blake3 of a <= 64-byte
# message (leaf rows, and merge_digests = blake3_256(left ‖ right)): one
# chunk, one block -> CHUNK_START | CHUNK_END | ROOT, counter 0.
_STANDALONE = CHUNK_START | CHUNK_END | ROOT
del PARENT  # unused here; deleted so nobody reaches for the wrong mode


def _leaves_run(m, block_len: int, n_levels: int):
    """Single-block leaf hash + full Merkle tree, one traceable program.

    Input (B, 16) uint32 message words (zero-padded blocks); returns the
    leaf digests plus levels above as a tuple [(B, 8), (B/2, 8), ...].
    """
    iv = jnp.broadcast_to(jnp.asarray(IV, dtype=_U32), (m.shape[0], 8))
    cv = _compress_vec(iv, m, 0, block_len, _STANDALONE)
    levels = [cv]
    width = m.shape[0]
    for _lvl in range(n_levels):
        width //= 2
        pair = levels[-1].reshape(width, 16)
        iv2 = jnp.broadcast_to(jnp.asarray(IV, dtype=_U32), (width, 8))
        levels.append(_compress_vec(iv2, pair, 0, 64, _STANDALONE))
    return tuple(levels)


@functools.lru_cache(maxsize=16)
def _leaves_jit(block_len: int, n_levels: int):
    return jax.jit(functools.partial(
        _leaves_run, block_len=block_len, n_levels=n_levels))


def _use_jit() -> bool:
    # XLA:CPU takes pathologically long to compile the unrolled compression
    # graph on this host; eager is fast and bit-identical, so the CPU backend
    # (tests, fallbacks) runs eager while accelerators take the jit.
    import os

    flag = os.environ.get("LIBZKP_DEVICE_HASH_JIT")
    if flag in ("0", "1"):
        return flag == "1"
    try:
        return jax.default_backend() != "cpu"
    except Exception:
        return False


def _rows_to_words(rows: Sequence[bytes]) -> jnp.ndarray:
    import numpy as np

    B = len(rows)
    L = len(rows[0])
    assert L <= 64, "single-block leaves only"
    buf = np.zeros((B, 64), dtype=np.uint8)
    for i, r in enumerate(rows):
        buf[i, : len(r)] = np.frombuffer(r, dtype=np.uint8)
    return jnp.asarray(buf.view(np.uint32))


def hash_leaves_device(rows: Sequence[bytes]) -> List[bytes]:
    """BLAKE3-256 of equal-length (<= 64 byte) byte rows, one device call.

    Leaf digests only (each row hashed as a root message) — the drop-in
    accelerated form of ``hash_element_rows``.
    """
    import numpy as np

    words = _rows_to_words(rows)
    fn = (_leaves_jit(len(rows[0]), 0) if _use_jit()
          else functools.partial(_leaves_run, block_len=len(rows[0]), n_levels=0))
    out = fn(words)[0]
    raw = np.asarray(out).astype(np.uint32).tobytes()
    return [raw[i * 32 : (i + 1) * 32] for i in range(len(rows))]


def merkle_tree_device(rows: Sequence[bytes]):
    """Leaf digests + all Merkle levels for power-of-two row counts, one jit.

    Returns (leaf_digests, levels) as lists of 32-byte digests, bit-exact
    with models/merkle.MerkleTree over blake3_256 leaf hashes.
    """
    import numpy as np

    B = len(rows)
    assert B & (B - 1) == 0 and B > 1
    n_levels = B.bit_length() - 1
    words = _rows_to_words(rows)
    fn = (_leaves_jit(len(rows[0]), n_levels) if _use_jit()
          else functools.partial(_leaves_run, block_len=len(rows[0]), n_levels=n_levels))
    levels = fn(words)
    out = []
    for lv in levels:
        raw = np.asarray(lv).astype(np.uint32).tobytes()
        out.append([raw[i * 32 : (i + 1) * 32] for i in range(lv.shape[0])])
    return out[0], out[1:]
