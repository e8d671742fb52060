#!/usr/bin/env python
"""Single-chip device-utilization measurement for the four device kernels.

Prints achieved element-ops/s (int32 multiply-accumulates on the VPU lanes,
derived from known per-op arithmetic counts) against a stated VPU peak
estimate, for: MSM (ops/curve_jax.py fold-field window engine), NTT
(ops/ntt.py ntt_device), MiMC (ops/mimc.py batch tier) and BLAKE3
(ops/blake3_device.py). This is the MFU-style evidence BASELINE.md's
"Device utilization" table records (VERDICT round-3 #2).

Methodology: inputs are placed on device first; K dependent iterations run
inside one jit chain and a single tiny d2h sync ends the timing, so the
~25 ms tunnel round-trip amortizes to <2% of each measurement. Transfer-
inclusive numbers are what the autotune records; THIS script isolates chip
compute.

VPU peak model (stated, conservative): 8 sublanes x 128 lanes x ~0.94 GHz
x 2 ops (mul+add issue) ~= 1.9e12 int32 lane-ops/s. The MXU is idle in all
of these kernels (elementwise limb arithmetic cannot share operands), so
MXU FLOPs are excluded from the denominator on purpose — the honest
utilization statement is against the unit the kernels can actually use.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.cache/libzkp_tpu/jax")
)
# Leave JAX_PLATFORMS as the caller set it; plugin registration happens via
# the environment's own sitecustomize (do NOT strip/overwrite PYTHONPATH —
# on tunneled-TPU hosts it points at that sitecustomize).

VPU_PEAK = 8 * 128 * 0.94e9 * 2  # int32 lane-ops/s, see module docstring


def _time_chain(fn, x, iters):
    """Best of 3: `iters` dependent applications chained at the Python
    level — each dispatch is async (a tunnel enqueue costs ~0), the device
    executes the chain serially, and ONE final block_until_ready pays the
    ~24 ms sync, amortized over the chain. No mega-graph compiles."""
    import jax

    jfn = jax.jit(fn)
    v = jfn(x)
    jax.block_until_ready(v)  # compile + warm
    best = float("inf")
    for _ in range(3):
        v = x
        t0 = time.monotonic()
        for _ in range(iters):
            v = jfn(v)
        jax.block_until_ready(v)
        best = min(best, time.monotonic() - t0)
    return best / iters


def main() -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np

    if jax.default_backend() == "cpu":
        print(json.dumps({"error": "no TPU visible (tunnel down?); refusing "
                          "to measure the CPU interpret path"}))
        return
    out = {"backend": jax.default_backend(), "vpu_peak_ops_per_s": VPU_PEAK}

    # ---- MiMC: 4096-lane batch, 110 rounds x (3 muls + add) ---------------
    from libzkp_tpu.ops import mimc as mimc_mod
    from libzkp_tpu.ops.limb import get_context

    from libzkp_tpu.ops.field import BN254_FR as _FR

    ctx = get_context(_FR.p)
    n = ctx.n
    B = 4096
    vals = list(range(1, B + 1))
    x = ctx.to_mont(ctx.encode(vals))

    const_m = jnp.asarray(
        np.stack(
            [
                np.asarray(ctx.encode_scalar(c * ctx.R % ctx.p))
                for c in mimc_mod.mimc_constants()
            ]
        )
    )

    def mimc_round_chain(v):
        # one full 110-round MiMC pass over the batch
        def body(i, cur):
            t = ctx.add(cur, const_m[i])
            t2 = ctx.mont_mul(t, t)
            t4 = ctx.mont_mul(t2, t2)
            return ctx.mont_mul(t4, t)

        return jax.lax.fori_loop(0, const_m.shape[0], body, v)

    per_pass = _time_chain(mimc_round_chain, x, 8)
    # MACs: 3 muls/round; mul ~= n^2 (conv) + n*(n+2) (fold) lane-MACs
    mul_macs = n * n + n * (n + 2)
    macs = B * 110 * (3 * mul_macs)
    out["mimc"] = {
        "batch": B,
        "hashes_per_s": round(B / per_pass, 1),
        "achieved_ops_per_s": round(macs / per_pass, 3),
        "pct_vpu_peak": round(100 * macs / per_pass / VPU_PEAK, 2),
    }

    # ---- NTT: batch of 256 size-512 transforms (Groth16-class domain) -----
    from libzkp_tpu.ops.field import BN254_FR
    from libzkp_tpu.ops.ntt import ntt_device

    nb, sz = 256, 512
    xs = ctx.to_mont(
        ctx.encode([(i * 7 + j) % ctx.p for i in range(nb) for j in range(sz)])
    ).reshape(nb, sz, n)
    per_ntt_batch = _time_chain(lambda v: ntt_device(ctx, v), xs, 4)
    butterflies = nb * (sz // 2) * (sz.bit_length() - 1)
    ntt_macs = butterflies * mul_macs  # one mont_mul per butterfly dominates
    out["ntt"] = {
        "batch": nb,
        "size": sz,
        "transforms_per_s": round(nb / per_ntt_batch, 1),
        "achieved_ops_per_s": round(ntt_macs / per_ntt_batch, 3),
        "pct_vpu_peak": round(100 * ntt_macs / per_ntt_batch / VPU_PEAK, 2),
    }

    # ---- MSM window step: K=129 tree-reduce + Horner fold, B=512 ----------
    from libzkp_tpu.ops import curve_jax as cj
    from libzkp_tpu.ops import ed25519 as ed

    eng = cj.edwards_engine()
    fctx = eng.ctx
    nf = fctx.n
    Bm = 512
    K = 160  # production pads the 129-point bulletproofs basis to the next
    # K_CHUNK multiple; measure the padded shape the kernel actually runs
    consts = jnp.asarray(eng.consts_np)
    import numpy as np

    pts_np = np.zeros((K, eng.coords, nf, Bm), dtype=np.int32)
    # any valid point batch: broadcast the basepoint's extended coords
    Bpt = ed.BASEPOINT
    enc = eng.encode_points([Bpt])[0]  # (4, nf)
    pts_np[:] = enc[None, :, :, None]
    pts = jnp.asarray(pts_np)
    wsum = cj._window_sum_call("ed25519", K, Bm)
    horner = cj._horner_call("ed25519", Bm)

    acc0 = jnp.asarray(
        np.broadcast_to(eng.identity_np()[..., None], (eng.coords, nf, Bm)).copy()
    )

    def window_step(acc):
        return horner(consts, acc, wsum(consts, pts))

    per_window = _time_chain(window_step, acc0, 4)
    # padds: K-1 (tree) + 9 (Horner: 8 doubles + 1 add) per lane; each padd
    # ~= 8 field muls (mul ~= nf^2 conv + nf*(nf+2) fold)
    f_mul = nf * nf + nf * (nf + 2)
    msm_macs = Bm * (K - 1 + 9) * 8 * f_mul
    out["msm_window"] = {
        "K_padded": K,
        "B": Bm,
        "window_steps_per_s": round(1.0 / per_window, 2),
        "full_msm_ms_per_lane": round(per_window * 32 / Bm * 1e3, 4),
        "achieved_ops_per_s": round(msm_macs / per_window, 3),
        "pct_vpu_peak": round(100 * msm_macs / per_window / VPU_PEAK, 2),
    }

    # ---- BLAKE3: vectorized compress over 4096 chaining lanes -------------
    try:
        from libzkp_tpu.ops import blake3_device as b3d
        from libzkp_tpu.ops.blake3 import IV

        nb3 = 4096
        cv = jnp.asarray(np.tile(np.asarray(IV, np.uint32), (nb3, 1)))
        block = jnp.asarray(
            np.arange(nb3 * 16, dtype=np.uint32).reshape(nb3, 16) | 1
        )

        def compress_step(v):
            return b3d._compress_vec(v, block, 0, 64, b3d._STANDALONE)

        per_c = _time_chain(compress_step, cv, 8)
        # 7 rounds x 8 G-functions x ~14 32-bit ops
        b3_ops = nb3 * 7 * 8 * 14
        out["blake3"] = {
            "lanes": nb3,
            "compress_per_s": round(nb3 / per_c, 1),
            "achieved_ops_per_s": round(b3_ops / per_c, 3),
            "pct_vpu_peak": round(100 * b3_ops / per_c / VPU_PEAK, 2),
        }
    except Exception as e:  # keep the table even if the API differs
        out["blake3"] = {"error": str(e)[:120]}

    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
