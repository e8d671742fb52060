"""Bulletproofs generator derivation (dalek-compatible chains).

Rebuilds what the reference gets from the ``bulletproofs`` crate
(``/root/reference/src/backend/bulletproofs.rs:55-80``):

* ``PedersenGens::default()``: B = Ristretto basepoint, B_blinding =
  SHA3-512 hash-to-group of the compressed basepoint.
* ``BulletproofGens::new(n, parties)``: per-party SHAKE-256
  ``GeneratorsChain`` labeled ``b"GeneratorsChain" || [b'G'|b'H'] || u32_le(party)``,
  each 64-byte read mapped to the group via Elligator.

Chains are cached per party like the reference's OnceLock generator cache.
"""

from __future__ import annotations

import functools
import hashlib
from typing import List, Tuple

from ..ops import ed25519 as ed


@functools.lru_cache(maxsize=1)
def pedersen_gens() -> Tuple[ed.Point, ed.Point]:
    """(B, B_blinding) of ``PedersenGens::default()``."""
    b = ed.BASEPOINT
    h = hashlib.sha3_512(ed.RISTRETTO_BASEPOINT_COMPRESSED).digest()
    b_blinding = ed.from_uniform_bytes(h)
    return b, b_blinding


def pedersen_commit(value: int, blinding: int) -> ed.Point:
    b, b_blinding = pedersen_gens()
    return ed.point_add(ed.scalar_mul(value, b), ed.scalar_mul(blinding, b_blinding))


def pedersen_commit_compressed_many(pairs) -> list:
    """Compressed Pedersen commitments for a list of (value, blinding) pairs
    (both already reduced mod l). Routes through the native 8-lane
    msm+compress when available; scalar fallback otherwise."""
    from .. import native

    if native.HAVE_NATIVE and pairs:
        b, b_blinding = pedersen_gens()
        basis = [b, b_blinding]
        out = native.ed_pedersen_compressed_many(tuple(basis), basis, pairs)
        if out is not None:
            return out
    return [ed.compress(pedersen_commit(v, bl)) for v, bl in pairs]


@functools.lru_cache(maxsize=64)
def _chain(label: bytes, count: int) -> Tuple[ed.Point, ...]:
    shake = hashlib.shake_256()
    shake.update(b"GeneratorsChain")
    shake.update(label)
    stream = shake.digest(64 * count)
    return tuple(
        ed.from_uniform_bytes(stream[i * 64 : (i + 1) * 64]) for i in range(count)
    )


@functools.lru_cache(maxsize=32)
def bp_gens(n_bits: int, party: int = 0) -> Tuple[Tuple[ed.Point, ...], Tuple[ed.Point, ...]]:
    """(G, H) generator vectors for one party share (dalek ``share(party)``)."""
    g_label = bytes([ord("G")]) + party.to_bytes(4, "little")
    h_label = bytes([ord("H")]) + party.to_bytes(4, "little")
    return _chain(g_label, n_bits), _chain(h_label, n_bits)
