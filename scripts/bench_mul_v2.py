#!/usr/bin/env python
"""Prototype bench: shift-free field-mul designs for the device MSM kernel.

Round-5 finding (bench_mul_strategies.py): VPU int32 MACs run at ~1.1 T/s but
sublane shifts (jnp.pad by 1 row) cost ~14x an add — the current fold mul is
shift-bound, not MAC-bound. Candidates measured here against the production
int32 12-bit mul:

  A. int32, 12-bit limbs, mod-8 PHASE-GROUPED conv: pads by multiples of 8
     sublanes are tile-aligned (cheap); only 8 sub-tile shifts per mul.
  B. f32 balanced 10-bit limbs (n=26), conv + carry-shift + fold all as
     MXU matmuls against constant 0/1 / fold matrices (exact: every partial
     sum < 2^24).
  C. aligned-pad microprobe: pad by 8 vs pad by 1 (validates A's premise).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def timeit(f, *args, n=7):
    jax.block_until_ready(f(*args))
    best = float("inf")
    for _ in range(n):
        t0 = time.monotonic()
        jax.block_until_ready(f(*args))
        best = min(best, time.monotonic() - t0)
    return best


def main():
    print("backend:", jax.default_backend(), flush=True)
    B = 512
    R = 64  # chained muls per dispatch

    # ---- C. aligned vs unaligned pad ------------------------------------
    x = jnp.asarray(np.random.randint(-4096, 4096, (48, B), np.int32))

    def pad1(x):
        for _ in range(64):
            x = jnp.pad(x[:-1, :], ((1, 0), (0, 0))) + x
        return x

    def pad8(x):
        for _ in range(64):
            x = jnp.pad(x[:-8, :], ((8, 0), (0, 0))) + x
        return x

    dt1 = timeit(jax.jit(pad1), x)
    dt8 = timeit(jax.jit(pad8), x)
    print(f"pad-by-1 chain: {dt1*1e6:8.1f} us   pad-by-8 chain: {dt8*1e6:8.1f} us "
          f"(aligned {dt1/dt8:.1f}x cheaper)", flush=True)

    # ---- production baseline ---------------------------------------------
    from libzkp_tpu.ops import ed25519 as ed
    from libzkp_tpu.ops.limbfold import FieldOps, get_fold_ctx

    ctx = get_fold_ctx(ed.P)
    consts = jnp.asarray(ctx.consts_block())
    f = FieldOps(ctx.n, consts)

    def chain_cur(a, b):
        x = a
        for _ in range(R):
            x = f._mul_impl(x, b)
        return x

    a0 = jnp.asarray(np.random.randint(0, 4096, (ctx.n, B), np.int32))
    b0 = jnp.asarray(np.random.randint(0, 4096, (ctx.n, B), np.int32))
    dt = timeit(jax.jit(chain_cur), a0, b0)
    r_cur = R * B / dt
    print(f"current int32 mul : {r_cur/1e6:8.1f} M fieldmul/s", flush=True)

    # ---- A. phase-grouped int32 conv -------------------------------------
    n = ctx.n  # 22
    NC = 2 * n + 2

    def mul_phase(a, b):
        # conv with aligned pads: group j by j % 8; aligned base-offset pads
        # by 8*g rows, then one residual shift per phase r.
        phases = []
        for r in range(8):
            acc = None
            for j in range(r, n, 8):
                g = j // 8
                t = a * b[j : j + 1, :]
                t = jnp.pad(t, ((8 * g, NC - n - 8 * g), (0, 0)))
                acc = t if acc is None else acc + t
            phases.append(acc)
        T = phases[0]
        for r in range(1, 8):
            if phases[r] is not None:
                T = T + jnp.pad(phases[r][:-r, :], ((r, 0), (0, 0)))
        T = f._carry_nw(f._carry_nw(T))
        acc = T[:n, :]
        for i in range(n + 2):
            acc = acc + T[n + i : n + i + 1, :] * f.fold_c[i][:, None]
        return f.carry(f.carry(f.carry(acc)))

    def chain_phase(a, b):
        x = a
        for _ in range(R):
            x = mul_phase(x, b)
        return x

    dt = timeit(jax.jit(chain_phase), a0, b0)
    r_ph = R * B / dt
    print(f"phase int32 mul   : {r_ph/1e6:8.1f} M fieldmul/s ({r_ph/r_cur:.2f}x)", flush=True)

    # correctness
    got = np.asarray(jax.jit(mul_phase)(a0[:, :4], b0[:, :4]))
    want = np.asarray(jax.jit(f._mul_impl)(a0[:, :4], b0[:, :4]))
    va = ctx.decode(np.transpose(got, (1, 0)))
    vb = ctx.decode(np.transpose(want, (1, 0)))
    assert va == vb, "phase mul mismatch"
    print("phase mul correct", flush=True)

    # ---- B. f32 balanced limbs + MXU limb motion --------------------------
    W = 10
    nf = 26
    p = ed.P
    HALF = 1 << (W - 1)

    def to_balanced(x, n_):
        out = np.zeros(n_, dtype=np.float64)
        for i in range(n_):
            d = x & ((1 << W) - 1)
            x >>= W
            if d >= HALF:
                d -= 1 << W
                x += 1
            out[i] = d
        assert x == 0, "overflow"
        return out

    def from_balanced(v):
        return sum(int(round(float(c))) << (W * i) for i, c in enumerate(v)) % p

    NCf = 2 * nf + 2  # 54 conv columns
    # one-hot conv matrix: C[k, i*nf+j] = 1 iff i+j == k
    Cm = np.zeros((NCf, nf * nf), dtype=np.float32)
    for i in range(nf):
        for j in range(nf):
            Cm[i + j, i * nf + j] = 1.0
    Cj = jnp.asarray(Cm)
    # fold matrix: rows = balanced limbs of 2^(W(nf+i)) mod p
    FOLDm = np.stack([to_balanced((1 << (W * (nf + i))) % p, nf) for i in range(nf + 2)])
    Fj = jnp.asarray(FOLDm.astype(np.float32))  # (nf+2, nf)
    ONEm = jnp.asarray(to_balanced((1 << (W * nf)) % p, nf).astype(np.float32))
    # shift matrix U: U[k, k-1] = 1 (carry moves up), wrap row from ONE
    Um = np.zeros((nf, nf), dtype=np.float32)
    for k in range(1, nf):
        Um[k, k - 1] = 1.0
    Uj = jnp.asarray(Um)

    TW = float(1 << W)
    ITW = 1.0 / TW
    RND = float(3 << (22 + W))  # round-to-nearest-2^W magic: (x+RND)-RND

    def split(x):
        hi2w = (x + RND) - RND
        return x - hi2w, hi2w * ITW  # (lo, hi) balanced lo in [-2^(W-1), 2^(W-1)]

    def carry_f(x):
        lo, hi = split(x)
        return (
            lo
            + jnp.dot(Uj, hi, preferred_element_type=jnp.float32)
            + hi[-1:, :] * ONEm[:, None]
        )

    def mul_mxu(a, b):
        O = (a[:, None, :] * b[None, :, :]).reshape(nf * nf, B)  # (676, B)
        T = jnp.dot(Cj, O, preferred_element_type=jnp.float32)  # (54, B)
        # two carry passes on the wide array (no-wrap: top column spare)
        for _ in range(2):
            lo, hi = split(T)
            T = lo + jnp.pad(hi[:-1, :], ((1, 0), (0, 0)))
        acc = T[:nf, :] + jnp.dot(
            Fj.T, T[nf:, :], preferred_element_type=jnp.float32
        )  # fold via MXU
        # three wrap passes: the wrap rows of pass 1 can reach ~2^21, pass 2
        # leaves ~2^12 in limbs 0-1, pass 3 restores |limb| <= ~2^9 + eps
        return carry_f(carry_f(carry_f(acc)))

    aF = jnp.asarray(
        np.stack([to_balanced(np.random.randint(0, 1 << 60) * 31 % p, nf) for _ in range(B)], axis=1).astype(np.float32)
    )
    bF = jnp.asarray(
        np.stack([to_balanced(np.random.randint(0, 1 << 60) * 37 % p, nf) for _ in range(B)], axis=1).astype(np.float32)
    )

    def chain_mxu(a, b):
        x = a
        for _ in range(R):
            x = mul_mxu(x, b)
        return x

    dt = timeit(jax.jit(chain_mxu), aF, bF)
    r_mx = R * B / dt
    print(f"f32+MXU mul       : {r_mx/1e6:8.1f} M fieldmul/s ({r_mx/r_cur:.2f}x)", flush=True)

    # correctness: chase one chained mul on host ints
    out = np.asarray(jax.jit(lambda a, b: mul_mxu(a, b))(aF, bF))
    for k in range(8):
        x = from_balanced(np.asarray(aF[:, k], np.float64))
        y = from_balanced(np.asarray(bF[:, k], np.float64))
        got = from_balanced(out[:, k].astype(np.float64))
        assert got == x * y % p, f"mxu mul wrong at lane {k}"
    print("mxu mul correct on 8 lanes", flush=True)

    # limb-bound check after chained muls (invariant preservation)
    res = np.asarray(jax.jit(chain_mxu)(aF, bF))
    print(f"max |limb| after {R} chained muls: {np.abs(res).max():.0f} (budget {2**(W-1)} + eps)", flush=True)


if __name__ == "__main__":
    main()
