"""Native host kernel loader (ctypes over ``zkpcore.cpp``).

The reference's host-side crypto comes from compiled Rust crates (blake3 via
winterfell, keccak via merlin, curve25519-dalek — SURVEY.md §2.2).  Our
equivalent native tier is a single C++ translation unit compiled on first use
with ``g++``; every routine is differentially tested against the pure-Python
golden models in :mod:`libzkp_tpu.ops`.  When no compiler or prebuilt
``_zkpcore.so`` is available everything silently falls back to pure Python —
the package stays importable anywhere.

Set ``LIBZKP_NO_NATIVE=1`` to force the pure-Python tier (used by the
differential tests).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import tempfile
from typing import List, Optional, Sequence, Tuple

from ..utils.threads import msm_chunks as _msm_chunks

_ZERO32 = bytes(32)

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "zkpcore.cpp")
_SO = os.path.join(_DIR, "_zkpcore.so")

_lib: Optional[ctypes.CDLL] = None


def _build() -> Optional[str]:
    """Compile zkpcore.cpp → _zkpcore.so (atomic rename). None on failure."""
    if not os.path.exists(_SRC):
        return None
    try:
        fd, tmp = tempfile.mkstemp(suffix=".so", dir=_DIR)
        os.close(fd)
        base = ["g++", "-O3", "-std=c++17", "-shared", "-fPIC", "-o", tmp, _SRC]
        # prefer native ISA (mulx/adx for the wide-limb carry chains) +
        # OpenMP (batch-parallel MSM); degrade gracefully
        for cmd in (
            base[:1] + ["-march=native", "-fopenmp"] + base[1:],
            base[:1] + ["-fopenmp"] + base[1:],
            base,
        ):
            try:
                subprocess.run(cmd, check=True, capture_output=True, timeout=240)
                os.replace(tmp, _SO)
                return _SO
            except subprocess.SubprocessError:
                continue
        raise OSError("all compile attempts failed")
    except (OSError, subprocess.SubprocessError):
        try:
            os.unlink(tmp)
        except OSError:
            pass
        return None


def _load() -> Optional[ctypes.CDLL]:
    if os.environ.get("LIBZKP_NO_NATIVE"):
        return None
    path = _SO
    if not os.path.exists(path) or (
        os.path.exists(_SRC) and os.path.getmtime(path) < os.path.getmtime(_SRC)
    ):
        path = _build()
        if path is None:
            path = _SO if os.path.exists(_SO) else None
    if path is None:
        return None
    try:
        lib = ctypes.CDLL(path)
    except OSError:
        return None
    u64 = ctypes.c_uint64
    u8p = ctypes.POINTER(ctypes.c_uint8)
    lib.zkp_blake3.argtypes = [ctypes.c_char_p, u64, ctypes.c_char_p]
    lib.zkp_blake3_batch.argtypes = [ctypes.c_char_p, u64, u64, ctypes.c_char_p]
    lib.zkp_blake3_merge_level.argtypes = [ctypes.c_char_p, u64, ctypes.c_char_p]
    lib.zkp_blake3_merkle.argtypes = [ctypes.c_char_p, u64, ctypes.c_char_p]
    lib.zkp_keccak_f1600.argtypes = [ctypes.c_char_p]
    lib.zkp_ed_point_add.argtypes = [ctypes.c_char_p] * 3
    lib.zkp_ed_point_double.argtypes = [ctypes.c_char_p] * 2
    lib.zkp_ed_scalar_mul.argtypes = [ctypes.c_char_p] * 3
    lib.zkp_ed_msm.argtypes = [u64, ctypes.c_char_p, ctypes.c_char_p, ctypes.c_char_p]
    lib.zkp_ristretto_compress.argtypes = [ctypes.c_char_p, ctypes.c_char_p]
    lib.zkp_ristretto_decompress.argtypes = [ctypes.c_char_p, ctypes.c_char_p]
    lib.zkp_ristretto_decompress.restype = ctypes.c_int
    lib.zkp_bn254_init.argtypes = [ctypes.c_char_p, ctypes.c_char_p, ctypes.c_char_p, u64]
    lib.zkp_bn254_g1_msm.argtypes = [u64, ctypes.c_char_p, ctypes.c_char_p, ctypes.c_char_p]
    lib.zkp_bn254_g2_msm.argtypes = [u64, ctypes.c_char_p, ctypes.c_char_p, ctypes.c_char_p]
    lib.zkp_bn254_g1_scalar_mul.argtypes = [ctypes.c_char_p] * 3
    lib.zkp_bn254_g2_scalar_mul.argtypes = [ctypes.c_char_p] * 3
    lib.zkp_bn254_multi_pairing.argtypes = [u64, ctypes.c_char_p, ctypes.c_char_p, ctypes.c_char_p]
    lib.zkp_bn254_miller.argtypes = [ctypes.c_char_p] * 3
    lib.zkp_bn254_multi_pairing_premul.argtypes = [
        ctypes.c_char_p, u64, ctypes.c_char_p, ctypes.c_char_p, ctypes.c_char_p]
    lib.zkp_ntt.argtypes = [u64, ctypes.c_char_p, ctypes.c_char_p, ctypes.c_char_p, ctypes.c_char_p]
    lib.zkp_groth16_h_register.argtypes = [
        u64, u64, u64, u64,
        ctypes.c_char_p, ctypes.c_char_p, ctypes.c_char_p,
        ctypes.c_char_p, ctypes.c_char_p, ctypes.c_char_p, u64,
        ctypes.c_char_p, ctypes.c_char_p, ctypes.c_char_p, u64,
        ctypes.c_char_p, ctypes.c_char_p, ctypes.c_char_p, u64]
    lib.zkp_groth16_h_register.restype = ctypes.c_int
    lib.zkp_groth16_h_run.argtypes = [
        ctypes.c_int, ctypes.c_char_p, ctypes.c_char_p]
    lib.zkp_groth16_h_run.restype = ctypes.c_int
    lib.zkp_ed_msm_register.argtypes = [u64, ctypes.c_char_p]
    lib.zkp_ed_msm_register.restype = ctypes.c_int
    lib.zkp_ed_msm_fixed.argtypes = [ctypes.c_int, ctypes.c_char_p, ctypes.c_char_p]
    lib.zkp_ed_msm_fixed_mt.argtypes = [
        ctypes.c_int, ctypes.c_char_p, ctypes.c_char_p, ctypes.c_int]
    lib.zkp_ed_msm_fixed_many.argtypes = [
        ctypes.c_int, u64, ctypes.c_char_p, ctypes.c_char_p]
    lib.zkp_bn254_g1_msm_register.argtypes = [u64, ctypes.c_char_p]
    lib.zkp_bn254_g1_msm_register.restype = ctypes.c_int
    lib.zkp_bn254_g1_msm_fixed.argtypes = [ctypes.c_int, ctypes.c_char_p, ctypes.c_char_p]
    lib.zkp_bn254_g1_msm_fixed_mt.argtypes = [
        ctypes.c_int, ctypes.c_char_p, ctypes.c_char_p, ctypes.c_int]
    lib.zkp_bn254_g1_msm_fixed_many.argtypes = [
        ctypes.c_int, u64, ctypes.c_char_p, ctypes.c_char_p]
    lib.zkp_bn254_g2_msm_register.argtypes = [u64, ctypes.c_char_p]
    lib.zkp_bn254_g2_msm_register.restype = ctypes.c_int
    lib.zkp_bn254_g2_msm_fixed.argtypes = [ctypes.c_int, ctypes.c_char_p, ctypes.c_char_p]
    lib.zkp_bn254_g2_msm_fixed_mt.argtypes = [
        ctypes.c_int, ctypes.c_char_p, ctypes.c_char_p, ctypes.c_int]
    lib.zkp_bn254_g2_msm_fixed_many.argtypes = [
        ctypes.c_int, u64, ctypes.c_char_p, ctypes.c_char_p]
    lib.zkp_bp_prove_batch.argtypes = [
        ctypes.c_int, ctypes.c_int, ctypes.c_int, u64, u64,
        ctypes.c_char_p, ctypes.c_char_p, ctypes.c_char_p, ctypes.c_char_p,
        ctypes.c_char_p, ctypes.c_char_p]
    lib.zkp_bp_prove_batch.restype = ctypes.c_int
    lib.zkp_ed_pedersen_compressed.argtypes = [
        ctypes.c_int, u64, ctypes.c_char_p, ctypes.c_char_p]
    lib.zkp_ed_pedersen_compressed.restype = ctypes.c_int
    lib.zkp_groth16_prove_msms.argtypes = [
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        u64, u64, u64, ctypes.c_char_p, ctypes.c_char_p, ctypes.c_char_p]
    lib.zkp_bp_verify_rlc.argtypes = [
        ctypes.c_int, u64, ctypes.c_char_p, ctypes.POINTER(ctypes.c_uint32),
        ctypes.c_char_p, ctypes.c_char_p, ctypes.c_char_p, ctypes.c_char_p,
        ctypes.c_char_p, ctypes.c_char_p]
    lib.zkp_bp_verify_rlc.restype = ctypes.c_int
    lib.zkp_groth16_spmv.argtypes = [
        u64, u64, u64, u64, ctypes.c_char_p,
        ctypes.c_char_p, ctypes.c_char_p, ctypes.c_char_p, u64,
        ctypes.c_char_p, ctypes.c_char_p, ctypes.c_char_p, u64,
        ctypes.c_char_p, ctypes.c_char_p, ctypes.c_char_p, u64,
        ctypes.c_char_p, ctypes.c_char_p, ctypes.c_char_p, ctypes.c_char_p]
    lib.zkp_groth16_spmv.restype = ctypes.c_int
    lib.zkp_stark_prove_improvement_batch.argtypes = [
        u64, ctypes.POINTER(ctypes.c_uint64), ctypes.c_char_p, ctypes.c_char_p,
        ctypes.c_char_p, u64, ctypes.c_char_p, u64,
        ctypes.POINTER(ctypes.c_int64)]
    lib.zkp_stark_verify_improvement.argtypes = [
        ctypes.c_char_p, ctypes.c_char_p, u64, u64, ctypes.c_char_p, u64,
        ctypes.c_char_p, u64]
    lib.zkp_stark_verify_improvement.restype = ctypes.c_int
    return lib


_lib = _load()
HAVE_NATIVE = _lib is not None


# ---------------------------------------------------------------------------
# hashing
# ---------------------------------------------------------------------------

def blake3_256(data: bytes) -> bytes:
    out = ctypes.create_string_buffer(32)
    _lib.zkp_blake3(bytes(data), len(data), out)
    return out.raw


def blake3_batch(items: Sequence[bytes], item_len: int) -> List[bytes]:
    """Hash n equal-length byte strings."""
    n = len(items)
    out = ctypes.create_string_buffer(32 * n)
    _lib.zkp_blake3_batch(b"".join(items), n, item_len, out)
    raw = out.raw
    return [raw[i * 32 : (i + 1) * 32] for i in range(n)]


def blake3_merkle_levels(leaves: Sequence[bytes]) -> List[List[bytes]]:
    """All levels above the leaves of a power-of-two Merkle tree, bottom-up."""
    n = len(leaves)
    total = n - 1  # n/2 + n/4 + ... + 1
    out = ctypes.create_string_buffer(32 * total)
    _lib.zkp_blake3_merkle(b"".join(leaves), n, out)
    levels: List[List[bytes]] = []
    off = 0
    width = n // 2
    while width >= 1:
        raw = out.raw
        levels.append([raw[(off + i) * 32 : (off + i + 1) * 32] for i in range(width)])
        off += width
        if width == 1:
            break
        width //= 2
    return levels


def keccak_f1600_bytes(state: bytearray) -> None:
    buf = ctypes.create_string_buffer(bytes(state), 200)
    _lib.zkp_keccak_f1600(buf)
    state[:] = buf.raw


# ---------------------------------------------------------------------------
# curve25519 / ristretto — wire format: X||Y||Z||T, 32-byte canonical LE each
# ---------------------------------------------------------------------------

_P25519 = 2**255 - 19

Point = Tuple[int, int, int, int]


def _to_wire(pt: Point) -> bytes:
    return b"".join((v % _P25519).to_bytes(32, "little") for v in pt)


def _from_wire(b: bytes) -> Point:
    return (
        int.from_bytes(b[0:32], "little"),
        int.from_bytes(b[32:64], "little"),
        int.from_bytes(b[64:96], "little"),
        int.from_bytes(b[96:128], "little"),
    )


def ed_point_add(p: Point, q: Point) -> Point:
    out = ctypes.create_string_buffer(128)
    _lib.zkp_ed_point_add(_to_wire(p), _to_wire(q), out)
    return _from_wire(out.raw)


def ed_scalar_mul(k: int, p: Point, order: int) -> Point:
    out = ctypes.create_string_buffer(128)
    _lib.zkp_ed_scalar_mul((k % order).to_bytes(32, "little"), _to_wire(p), out)
    return _from_wire(out.raw)


# Generator bases (Pedersen/Bulletproof gens) are process-constant and reused
# across every MSM call; memoize their wire encoding.
_wire_cache: dict = {}


def _to_wire_cached(pt: Point) -> bytes:
    w = _wire_cache.get(pt)
    if w is None:
        if len(_wire_cache) > 1 << 16:
            _wire_cache.clear()
        w = _wire_cache[pt] = _to_wire(pt)
    return w


def ed_msm(scalars: Sequence[int], points: Sequence[Point], order: int) -> Point:
    n = len(scalars)
    sc = b"".join((s % order).to_bytes(32, "little") for s in scalars)
    pb = b"".join(_to_wire_cached(p) for p in points)
    out = ctypes.create_string_buffer(128)
    _lib.zkp_ed_msm(n, sc, pb, out)
    return _from_wire(out.raw)


# Fixed-base (BGMW) MSM: the basis is registered once (precomputed shifted
# affine tables in C++); subsequent calls pass only the scalar vector.
# Registration is serialized — the C++ registries are std::vectors.
import threading as _threading

_reg_lock = _threading.Lock()
_ed_handles: dict = {}
_g1_handles: dict = {}
_g2_handles: dict = {}


# Precomputed tables are never evicted (the C++ registry only grows), so cap
# how many distinct bases may register; callers fall back to the plain MSM
# beyond the cap instead of leaking table memory.
_MAX_FIXED_BASES = 64


def _get_handle(cache: dict, key, register):
    h = cache.get(key)
    if h is None:
        with _reg_lock:
            h = cache.get(key)
            if h is None:
                if len(cache) >= _MAX_FIXED_BASES:
                    return None
                h = cache[key] = register()
    return h


def ed_msm_fixed(key, scalars: Sequence[int], points: Sequence[Point], order: int) -> Point:
    h = _get_handle(
        _ed_handles, key,
        lambda: _lib.zkp_ed_msm_register(
            len(points), b"".join(_to_wire(p) for p in points)),
    )
    if h is None:
        return ed_msm(scalars, points, order)
    sc = b"".join((s % order).to_bytes(32, "little") for s in scalars)
    out = ctypes.create_string_buffer(128)
    _lib.zkp_ed_msm_fixed_mt(h, sc, out, _msm_chunks())
    return _from_wire(out.raw)


def ed_msm_fixed_many(key, scalar_vecs, points, order: int):
    """Batch of independent MSMs over one registered basis; returns a list
    of points. OMP-parallel across the batch inside one native call."""
    h = _get_handle(
        _ed_handles, key,
        lambda: _lib.zkp_ed_msm_register(
            len(points), b"".join(_to_wire(p) for p in points)),
    )
    if h is None:
        return [ed_msm(sv, points, order) for sv in scalar_vecs]
    batch = len(scalar_vecs)
    # zero fast-path: IPP round vectors are ~75% zeros; skip the mod+to_bytes
    sc = b"".join(
        _ZERO32 if s == 0 else (s % order).to_bytes(32, "little")
        for sv in scalar_vecs
        for s in sv
    )
    out = ctypes.create_string_buffer(128 * batch)
    _lib.zkp_ed_msm_fixed_many(h, batch, sc, out)
    raw = out.raw
    return [_from_wire(raw[i * 128 : (i + 1) * 128]) for i in range(batch)]


def ed_fixed_handle(key, points) -> Optional[int]:
    """Registered-table handle for a process-constant ed25519 basis."""
    return _get_handle(
        _ed_handles, key,
        lambda: _lib.zkp_ed_msm_register(
            len(points), b"".join(_to_wire(p) for p in points)),
    )


def bp_prove_batch(
    h_vs: int,
    h_as: int,
    h_ipp: int,
    n: int,
    values: Sequence[int],
    gammas: Sequence[int],
    rnd: bytes,
    transcripts: bytes,
):
    """Whole-pipeline native range-proof batch (see zkpcore.cpp
    zkp_bp_prove_batch). Returns (v_compressed_list, proof_bytes_list);
    raises ValueError on an identity value commitment (host-tier parity)."""
    batch = len(values)
    rounds = n.bit_length() - 1
    plen = (9 + 2 * rounds) * 32
    vb = b"".join(int(v).to_bytes(8, "little") for v in values)
    gb = b"".join(int(g).to_bytes(32, "little") for g in gammas)
    out_v = ctypes.create_string_buffer(32 * batch)
    out_p = ctypes.create_string_buffer(plen * batch)
    rc = _lib.zkp_bp_prove_batch(
        h_vs, h_as, h_ipp, n, batch, vb, gb, rnd, transcripts, out_v, out_p
    )
    if rc == 1:
        raise ValueError("value commitment is the identity")
    if rc != 0:
        raise RuntimeError(f"native bp prover failed: {rc}")
    raw_v, raw_p = out_v.raw, out_p.raw
    vs = [raw_v[i * 32 : (i + 1) * 32] for i in range(batch)]
    ps = [raw_p[i * plen : (i + 1) * plen] for i in range(batch)]
    return vs, ps


def ed_pedersen_compressed_many(key, points, pairs):
    """Batched compressed Pedersen commitments over the fixed 2-point basis
    (B, B_blinding): pairs = [(value, blinding)] already reduced mod l.
    Returns a list of 32-byte encodings, or None (caller falls back)."""
    h = _get_handle(
        _ed_handles, key,
        lambda: _lib.zkp_ed_msm_register(
            len(points), b"".join(_to_wire(p) for p in points)),
    )
    if h is None:
        return None
    sb = b"".join(
        int(v).to_bytes(32, "little") + int(b).to_bytes(32, "little")
        for v, b in pairs
    )
    out = ctypes.create_string_buffer(32 * len(pairs))
    if _lib.zkp_ed_pedersen_compressed(h, len(pairs), sb, out) != 0:
        return None
    raw = out.raw
    return [raw[i * 32 : (i + 1) * 32] for i in range(len(pairs))]


def bn254_g1_msm_fixed_many(key, scalar_vecs, points):
    h = _get_handle(
        _g1_handles, key,
        lambda: _lib.zkp_bn254_g1_msm_register(
            len(points), b"".join(_g1_to_wire(p) for p in points)),
    )
    if h is None:
        return [bn254_g1_msm(sv, points) for sv in scalar_vecs]
    batch = len(scalar_vecs)
    sc = b"".join(
        _ZERO32 if s == 0 else (s % _bn254_r).to_bytes(32, "little")
        for sv in scalar_vecs
        for s in sv
    )
    out = ctypes.create_string_buffer(96 * batch)
    _lib.zkp_bn254_g1_msm_fixed_many(h, batch, sc, out)
    raw = out.raw
    return [_g1_from_wire(raw[i * 96 : (i + 1) * 96]) for i in range(batch)]


def bn254_g2_msm_fixed_many(key, scalar_vecs, points):
    h = _get_handle(
        _g2_handles, key,
        lambda: _lib.zkp_bn254_g2_msm_register(
            len(points), b"".join(_g2_to_wire(p) for p in points)),
    )
    if h is None:
        return [bn254_g2_msm(sv, points) for sv in scalar_vecs]
    batch = len(scalar_vecs)
    sc = b"".join(
        (s % _bn254_r).to_bytes(32, "little") for sv in scalar_vecs for s in sv
    )
    out = ctypes.create_string_buffer(192 * batch)
    _lib.zkp_bn254_g2_msm_fixed_many(h, batch, sc, out)
    raw = out.raw
    return [_g2_from_wire(raw[i * 192 : (i + 1) * 192]) for i in range(batch)]


def bp_verify_rlc(h_fix: int, ns, proofs, vs, transcripts, rhos, sigmas):
    """RLC batch verify: (rc, bad_list). rc 1 = pass, 0 = fail, 2 = structural
    failures flagged in bad_list (relation not evaluated)."""
    count = len(ns)
    offs = (ctypes.c_uint32 * (count + 1))()
    blob = bytearray()
    for i, p in enumerate(proofs):
        offs[i] = len(blob)
        blob += p
    offs[count] = len(blob)
    bad = ctypes.create_string_buffer(count)
    rc = _lib.zkp_bp_verify_rlc(
        h_fix, count, bytes(ns), offs, bytes(blob), b"".join(vs),
        b"".join(transcripts), b"".join(rhos), b"".join(sigmas), bad,
    )
    return rc, list(bad.raw[:count])


def g1_fixed_handle(key, points) -> Optional[int]:
    return _get_handle(
        _g1_handles, key,
        lambda: _lib.zkp_bn254_g1_msm_register(
            len(points), b"".join(_g1_to_wire(p) for p in points)),
    )


def g2_fixed_handle(key, points) -> Optional[int]:
    return _get_handle(
        _g2_handles, key,
        lambda: _lib.zkp_bn254_g2_msm_register(
            len(points), b"".join(_g2_to_wire(p) for p in points)),
    )


def groth16_prove_msms(ha, hb1, hh, hl, hb2, z: Sequence[int], h: Sequence[int],
                       wit_off: int):
    """All five Groth16 query MSMs in one window-chunked OMP dispatch.
    Returns (a_acc, b_g1_acc, h_acc, l_acc, b_g2_acc)."""
    r = _bn254_r
    zb = b"".join((s % r).to_bytes(32, "little") for s in z)
    hb = b"".join((s % r).to_bytes(32, "little") for s in h)
    out = ctypes.create_string_buffer(4 * 96 + 192)
    _lib.zkp_groth16_prove_msms(
        ha, hb1, hh, hl, hb2, len(z), len(h), wit_off, zb, hb, out
    )
    raw = out.raw
    g1s = [_g1_from_wire(raw[i * 96 : (i + 1) * 96]) for i in range(4)]
    b_g2 = _g2_from_wire(out.raw[384:576])
    return g1s[0], g1s[1], g1s[2], g1s[3], b_g2


def bn254_g1_msm_fixed(key, scalars: Sequence[int], points):
    h = _get_handle(
        _g1_handles, key,
        lambda: _lib.zkp_bn254_g1_msm_register(
            len(points), b"".join(_g1_to_wire(p) for p in points)),
    )
    if h is None:
        return bn254_g1_msm(scalars, points)
    sc = b"".join((s % _bn254_r).to_bytes(32, "little") for s in scalars)
    out = ctypes.create_string_buffer(96)
    _lib.zkp_bn254_g1_msm_fixed_mt(h, sc, out, _msm_chunks())
    return _g1_from_wire(out.raw)


def bn254_g2_msm_fixed(key, scalars: Sequence[int], points):
    h = _get_handle(
        _g2_handles, key,
        lambda: _lib.zkp_bn254_g2_msm_register(
            len(points), b"".join(_g2_to_wire(p) for p in points)),
    )
    if h is None:
        return bn254_g2_msm(scalars, points)
    sc = b"".join((s % _bn254_r).to_bytes(32, "little") for s in scalars)
    out = ctypes.create_string_buffer(192)
    _lib.zkp_bn254_g2_msm_fixed_mt(h, sc, out, _msm_chunks())
    return _g2_from_wire(out.raw)


def ristretto_compress(pt: Point) -> bytes:
    out = ctypes.create_string_buffer(32)
    _lib.zkp_ristretto_compress(_to_wire(pt), out)
    return out.raw


def ristretto_decompress(data: bytes) -> Optional[Point]:
    if len(data) != 32:
        return None
    out = ctypes.create_string_buffer(128)
    if _lib.zkp_ristretto_decompress(bytes(data), out) != 1:
        return None
    return _from_wire(out.raw)


# ---------------------------------------------------------------------------
# BN254 — all curve constants are passed in by ops/bn254.py at wiring time
# (computed by the Python golden model) so nothing is transcribed by hand.
# G1 wire: Jacobian X||Y||Z, 32B LE each (96B); G2: 6 x 32B (192B);
# Fq12 wire: 12 x 32B in tower nesting order.
# ---------------------------------------------------------------------------

_bn254_q = 0
_bn254_r = 0


def bn254_init(q: int, r: int, frob_gamma1, hard_exp: int) -> None:
    """frob_gamma1: 6 Fq2 pairs; hard_exp: (q^4-q^2+1)/r."""
    global _bn254_q, _bn254_r
    _bn254_q, _bn254_r = q, r
    frob = b"".join(
        c.to_bytes(32, "little") for pair in frob_gamma1 for c in (pair[0], pair[1])
    )
    he = hard_exp.to_bytes((hard_exp.bit_length() + 7) // 8, "little")
    _lib.zkp_bn254_init(q.to_bytes(32, "little"), frob, he, len(he))


def _g1_to_wire(p) -> bytes:
    q = _bn254_q
    return b"".join((int(v) % q).to_bytes(32, "little") for v in p)


def _g1_from_wire(b: bytes):
    return (
        int.from_bytes(b[0:32], "little"),
        int.from_bytes(b[32:64], "little"),
        int.from_bytes(b[64:96], "little"),
    )


def _g2_to_wire(p) -> bytes:
    q = _bn254_q
    return b"".join(
        (int(c) % q).to_bytes(32, "little") for coord in p for c in (coord[0], coord[1])
    )


def _g2_from_wire(b: bytes):
    v = [int.from_bytes(b[i * 32 : (i + 1) * 32], "little") for i in range(6)]
    return ((v[0], v[1]), (v[2], v[3]), (v[4], v[5]))


_g1_wire_cache: dict = {}
_g2_wire_cache: dict = {}


def _g1_wire_cached(p) -> bytes:
    w = _g1_wire_cache.get(p)
    if w is None:
        if len(_g1_wire_cache) > 1 << 16:
            _g1_wire_cache.clear()
        w = _g1_wire_cache[p] = _g1_to_wire(p)
    return w


def _g2_wire_cached(p) -> bytes:
    w = _g2_wire_cache.get(p)
    if w is None:
        if len(_g2_wire_cache) > 1 << 16:
            _g2_wire_cache.clear()
        w = _g2_wire_cache[p] = _g2_to_wire(p)
    return w


def bn254_g1_msm(scalars: Sequence[int], points) :
    r = _bn254_r
    sc = b"".join((s % r).to_bytes(32, "little") for s in scalars)
    pb = b"".join(_g1_wire_cached(p) for p in points)
    out = ctypes.create_string_buffer(96)
    _lib.zkp_bn254_g1_msm(len(points), sc, pb, out)
    return _g1_from_wire(out.raw)


def bn254_g2_msm(scalars: Sequence[int], points):
    r = _bn254_r
    sc = b"".join((s % r).to_bytes(32, "little") for s in scalars)
    pb = b"".join(_g2_wire_cached(p) for p in points)
    out = ctypes.create_string_buffer(192)
    _lib.zkp_bn254_g2_msm(len(points), sc, pb, out)
    return _g2_from_wire(out.raw)


def bn254_g1_scalar_mul(k: int, p):
    out = ctypes.create_string_buffer(96)
    _lib.zkp_bn254_g1_scalar_mul((k % _bn254_r).to_bytes(32, "little"), _g1_to_wire(p), out)
    return _g1_from_wire(out.raw)


def bn254_g2_scalar_mul(k: int, p):
    out = ctypes.create_string_buffer(192)
    _lib.zkp_bn254_g2_scalar_mul((k % _bn254_r).to_bytes(32, "little"), _g2_to_wire(p), out)
    return _g2_from_wire(out.raw)


_g16h_handles: dict = {}


def groth16_h(
    n: int,
    n_constraints: int,
    n_instance: int,
    p: int,
    root: int,
    coset_g: int,
    csr,  # ((a_ptr, a_idx, a_coef, a_nnz), (b...), (c...)) as packed bytes
    z: Sequence[int],
) -> List[int]:
    """Full h(x) pipeline: spmv + 7 NTTs + coset scaling in one native call.

    The circuit constants (CSR matrices, Montgomery conversions, twiddle
    roots, coset power tables) register once per circuit — keyed by the csr
    byte objects themselves (bytes hashes are cached by CPython, so repeat
    lookups are O(1)) — and only z crosses the boundary per call."""
    key = (n, n_constraints, n_instance, p, root, coset_g, csr)
    h = _g16h_handles.get(key)
    if h is None:
        with _reg_lock:
            h = _g16h_handles.get(key)
            if h is None:
                # Native contexts (CSR + power tables) are never freed, so cap
                # registrations instead of evicting: past the cap a new circuit
                # shape is refused and the caller falls back to the non-fused
                # path (groth16_spmv + ntt) rather than leaking native memory.
                if len(_g16h_handles) >= _MAX_FIXED_BASES:
                    raise MemoryError(
                        "groth16_h circuit registry full "
                        f"({_MAX_FIXED_BASES} circuits); use the unfused path"
                    )
                (ap, ai, ac, an), (bp, bi, bc, bn_), (cp, ci, cc, cn) = csr
                h = _lib.zkp_groth16_h_register(
                    n, n_constraints, n_instance, len(z),
                    p.to_bytes(32, "little"), (root % p).to_bytes(32, "little"),
                    (coset_g % p).to_bytes(32, "little"),
                    ap, ai, ac, an, bp, bi, bc, bn_, cp, ci, cc, cn,
                )
                _g16h_handles[key] = h
    zb = b"".join((v % p).to_bytes(32, "little") for v in z)
    out = ctypes.create_string_buffer(32 * (n - 1))
    rc = _lib.zkp_groth16_h_run(h, zb, out)
    if rc != 0:
        raise AssertionError("h degree exceeds n-2: unsatisfied constraint system?")
    raw = out.raw
    return [int.from_bytes(raw[i * 32 : (i + 1) * 32], "little") for i in range(n - 1)]


_STARK_OUT_STRIDE = 8192


def stark_prove_improvement_batch(pairs, p: int, root64: int, ctx_list):
    """Whole-pipeline STARK improvement prover (see zkpcore.cpp
    zkp_stark_prove_improvement_batch). pairs: [(old, new)]; ctx_list: the
    per-pair random-coin seed material (equal lengths). Returns proof-bytes
    list; raises ValueError when a pair has no valid witness."""
    batch = len(pairs)
    ctx_stride = len(ctx_list[0])
    assert all(len(cb) == ctx_stride for cb in ctx_list)
    pair_arr = (ctypes.c_uint64 * (2 * batch))()
    for i, (old, new) in enumerate(pairs):
        pair_arr[2 * i] = old
        pair_arr[2 * i + 1] = new
    out = ctypes.create_string_buffer(_STARK_OUT_STRIDE * batch)
    lens = (ctypes.c_int64 * batch)()
    _lib.zkp_stark_prove_improvement_batch(
        batch, pair_arr, p.to_bytes(32, "little"),
        (root64 % p).to_bytes(32, "little"), b"".join(ctx_list), ctx_stride,
        out, _STARK_OUT_STRIDE, lens,
    )
    res = []
    raw_out = out.raw  # snapshot once: .raw copies the whole buffer per access
    for i in range(batch):
        if lens[i] < 0:
            raise ValueError("invalid improvement witness")
        res.append(raw_out[i * _STARK_OUT_STRIDE : i * _STARK_OUT_STRIDE + lens[i]])
    return res


def stark_verify_improvement(old: int, new: int, p: int, root64: int,
                             ctx_bytes: bytes, proof: bytes) -> bool:
    return bool(
        _lib.zkp_stark_verify_improvement(
            p.to_bytes(32, "little"), (root64 % p).to_bytes(32, "little"),
            old, new, ctx_bytes, len(ctx_bytes), proof, len(proof),
        )
    )


def groth16_spmv(n: int, n_constraints: int, n_instance: int, p: int, csr, z):
    """az/bz/cz evaluation vectors (lists of ints) — the sparse half of the
    h-pipeline; the NTT half can then run on the device (groth16_device)."""
    zb = b"".join((v % p).to_bytes(32, "little") for v in z)
    az = ctypes.create_string_buffer(32 * n)
    bz = ctypes.create_string_buffer(32 * n)
    cz = ctypes.create_string_buffer(32 * n)
    (ap, ai, ac, an), (bp, bi, bc, bn_), (cp, ci, cc, cn) = csr
    _lib.zkp_groth16_spmv(
        n, n_constraints, n_instance, len(z), p.to_bytes(32, "little"),
        ap, ai, ac, an, bp, bi, bc, bn_, cp, ci, cc, cn, zb, az, bz, cz,
    )
    rd = lambda buf: [
        int.from_bytes(buf.raw[i * 32 : (i + 1) * 32], "little") for i in range(n)
    ]
    return rd(az), rd(bz), rd(cz)


def ntt(p: int, values: Sequence[int], root: int, scale: Optional[int]) -> List[int]:
    """Radix-2 NTT over prime p (caller supplies the size-n root; for the
    inverse transform pass the inverted root and scale = n^{-1} mod p)."""
    n = len(values)
    buf = ctypes.create_string_buffer(
        b"".join((v % p).to_bytes(32, "little") for v in values), 32 * n
    )
    sc = (scale % p).to_bytes(32, "little") if scale is not None else None
    _lib.zkp_ntt(n, buf, p.to_bytes(32, "little"), (root % p).to_bytes(32, "little"), sc)
    raw = buf.raw  # snapshot once: .raw copies the whole buffer per access
    return [int.from_bytes(raw[i * 32 : (i + 1) * 32], "little") for i in range(n)]


def _fq12_from_wire(raw: bytes):
    v = [int.from_bytes(raw[i * 32 : (i + 1) * 32], "little") for i in range(12)]
    return (
        ((v[0], v[1]), (v[2], v[3]), (v[4], v[5])),
        ((v[6], v[7]), (v[8], v[9]), (v[10], v[11])),
    )


def bn254_multi_pairing(pairs):
    """pairs: [(G1 jacobian, G2 jacobian)] -> Fq12 nested tuple."""
    n = len(pairs)
    g1b = b"".join(_g1_to_wire(p) for p, _ in pairs)
    g2b = b"".join(_g2_to_wire(q) for _, q in pairs)
    out = ctypes.create_string_buffer(384)
    _lib.zkp_bn254_multi_pairing(n, g1b, g2b, out)
    return _fq12_from_wire(out.raw)


def bn254_miller_bytes(g1, g2) -> bytes:
    """Pre-final-exp Miller value as wire bytes (for caching constant pairs)."""
    out = ctypes.create_string_buffer(384)
    _lib.zkp_bn254_miller(_g1_to_wire(g1), _g2_to_wire(g2), out)
    return out.raw


def bn254_multi_pairing_premul(f_pre: bytes, pairs):
    """multi_pairing with a cached extra Miller factor folded in."""
    n = len(pairs)
    g1b = b"".join(_g1_to_wire(p) for p, _ in pairs)
    g2b = b"".join(_g2_to_wire(q) for _, q in pairs)
    out = ctypes.create_string_buffer(384)
    _lib.zkp_bn254_multi_pairing_premul(f_pre, n, g1b, g2b, out)
    return _fq12_from_wire(out.raw)
