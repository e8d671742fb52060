"""Device tier for the Groth16 QAP h-polynomial pipeline.

The hot loop of ``Groth16::prove`` after witness synthesis is 7 radix-2 NTTs
over BN254 Fr per proof (interpolate az/bz/cz, evaluate each on the coset,
interpolate h off the coset — reference ark-groth16 internals at
``/root/reference/src/backend/snark.rs:364``). The host tier runs them in
C++ (``zkpcore.cpp zkp_groth16_h``); this module runs the NTT half for a
whole bucket of proofs as ONE jitted program on the accelerator
(:func:`libzkp_tpu.ops.ntt.ntt_device` batched over proofs × 3 vectors),
with the irregular sparse-matrix half staying native
(``native.groth16_spmv``). Differentially tested against the C++ pipeline
(tests/test_snark.py).
"""

from __future__ import annotations

import functools
from typing import List, Sequence

import jax
import jax.numpy as jnp

from .field import BN254_FR
from .limb import get_context
from .ntt import ntt_device


@functools.lru_cache(maxsize=8)
def _h_tables(n: int, coset_g: int):
    """Host-precomputed Montgomery tables: g^i, g^{-i}, (g^n - 1)^{-1}."""
    import numpy as np

    from .limb import _int_to_limbs

    p = BN254_FR.p
    ctx = get_context(p, "bn254_fr")
    g_pows = np.zeros((n, ctx.n), dtype=np.int32)
    gi_pows = np.zeros((n, ctx.n), dtype=np.int32)
    g_inv = pow(coset_g, -1, p)
    cur, curi = 1, 1
    for i in range(n):
        g_pows[i] = _int_to_limbs(cur * ctx.R % p, ctx.n)
        gi_pows[i] = _int_to_limbs(curi * ctx.R % p, ctx.n)
        cur = cur * coset_g % p
        curi = curi * g_inv % p
    zinv = pow((pow(coset_g, n, p) - 1) % p, -1, p)
    zinv_m = np.asarray(_int_to_limbs(zinv * ctx.R % p, ctx.n))
    return g_pows, gi_pows, zinv_m


@functools.lru_cache(maxsize=8)
def _h_jitted(n: int, coset_g: int):
    ctx = get_context(BN254_FR.p, "bn254_fr")
    g_pows, gi_pows, zinv_m = _h_tables(n, coset_g)

    def run(abc: jnp.ndarray):  # (3B, n, limbs) canonical: az ‖ bz ‖ cz
        xm = ctx.to_mont(abc)
        coeffs = ntt_device(ctx, xm, invert=True)          # interpolate
        shifted = ctx.mont_mul(coeffs, jnp.asarray(g_pows))
        on_coset = ntt_device(ctx, shifted, invert=False)  # coset evals
        b3 = on_coset.shape[0] // 3
        az, bz, cz = on_coset[:b3], on_coset[b3 : 2 * b3], on_coset[2 * b3 :]
        h_ev = ctx.mont_mul(
            ctx.sub(ctx.mont_mul(az, bz), cz), jnp.asarray(zinv_m)
        )
        h = ntt_device(ctx, h_ev, invert=True)             # off-coset interp
        h = ctx.mont_mul(h, jnp.asarray(gi_pows))
        return ctx.from_mont(h)

    return jax.jit(run)


def h_batch_device(
    n: int, az_list: Sequence, bz_list: Sequence, cz_list: Sequence,
    coset_g: int = 5,
) -> List[List[int]]:
    """h-coefficient vectors for a bucket of proofs; one device dispatch.

    Inputs are per-proof az/bz/cz evaluation vectors (length n each, from
    ``native.groth16_spmv``); returns per-proof ``h[: n-1]`` exactly like
    ``native.groth16_h``. Raises AssertionError when any h has degree > n-2
    (unsatisfied constraint system — same check as the host tier).
    """
    ctx = get_context(BN254_FR.p, "bn254_fr")
    B = len(az_list)
    flat = [v for vec in list(az_list) + list(bz_list) + list(cz_list) for v in vec]
    x = ctx.encode(flat).reshape(3 * B, n, ctx.n)
    out = _h_jitted(n, coset_g)(x)
    ints = ctx.decode(out)
    res = []
    for j in range(B):
        h = ints[j * n : (j + 1) * n]
        assert h[n - 1] == 0, "h degree exceeds n-2: unsatisfied constraints?"
        res.append(h[: n - 1])
    return res
