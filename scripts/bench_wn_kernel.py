"""Microbenchmark: WN coupling-stack conv implementations on the real TPU.

VERDICT r4 next #1 (3rd-round ask): settle whether a hand kernel beats XLA
on the dominant cost — the 8 WaveNet coupling stacks (reference
common.py:776-835, decoders.py:184-196). The trace measurement
(scripts/profile_step_trace.py) shows XLA already fuses the softplus/gate
elementwise INTO the conv fusions (WN scope: 88.7 ms conv-fusion vs 0.4 ms
loop-fusion per step), so the only possible win is conv-kernel efficiency:
XLA's convs run at 152.7 TF/s fwd / 143.2 TF/s bwd (77.5% / 72.7% of the
197 TF/s v5e bf16 peak) while active.

Variants, all at the flagship bench shape (B=32, T=256 post-squeeze,
C=1024, k=5, dilations 1/2/4/8, softplus, 4 layers + 1x1 res_skip each):

  A  lax.conv_general_dilated (what ops/conv.py conv1d_same emits today)
  B  conv as k shifted matmuls: y = sum_i shift(x, (i-k//2)*d) @ W[i]
     (XLA's matmul path; natively differentiable, drop-in for conv1d_same)
  C  Pallas fused dilated-conv+softplus kernel (VMEM-resident weights,
     grid (Cout-blocks, B), f32 accumulate; fwd-only — its number is the
     ceiling a custom_vjp version could reach on the forward)

Each timed as fwd and (A, B) as value_and_grad with the res_skip/skip-sum
structure of WN so the comparison includes the backward that dominates the
step (76 of 100 conv-ms). Prints a table + JSON line.

Usage: python scripts/bench_wn_kernel.py [--batch 32] [--t 256] [--iters 30]
"""
from __future__ import annotations

import argparse
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

C = 1024
K = 5
DILATIONS = (1, 2, 4, 8)
PEAK = 197e12


def stack_flops(B, T, n_layers=4):
    # per layer: k=5 conv C->C + 1x1 res_skip C->C, fwd MACs * 2
    return n_layers * (2 * K * C * C + 2 * C * C) * B * T


def make_params(rng):
    import jax.numpy as jnp
    ps = []
    for i, d in enumerate(DILATIONS):
        wc = jnp.asarray(rng.standard_normal((K, C, C)) * 0.02, jnp.float32)
        bc = jnp.zeros((C,), jnp.float32)
        wr = jnp.asarray(rng.standard_normal((C, C)) * 0.02, jnp.float32)
        br = jnp.zeros((C,), jnp.float32)
        ps.append((wc, bc, wr, br))
    return ps


# ---- variant A: lax conv (current conv1d_same path) ------------------------
def conv_lax(x, w, dilation):
    import jax
    import jax.numpy as jnp
    pad = dilation * (K - 1) // 2
    return jax.lax.conv_general_dilated(
        x.astype(jnp.bfloat16), w.astype(jnp.bfloat16), (1,),
        [(pad, pad)], rhs_dilation=(dilation,),
        dimension_numbers=("NWC", "WIO", "NWC"),
        preferred_element_type=jnp.bfloat16).astype(jnp.float32)


# ---- variant B: conv as K shifted matmuls ----------------------------------
def conv_matmul(x, w, dilation):
    import jax.numpy as jnp
    pad = dilation * (K - 1) // 2
    T = x.shape[1]
    xb = jnp.pad(x.astype(jnp.bfloat16), ((0, 0), (pad, pad), (0, 0)))
    wb = w.astype(jnp.bfloat16)
    out = None
    for i in range(K):
        tap = jnp.einsum("btc,cd->btd", xb[:, i * dilation:i * dilation + T],
                         wb[i], preferred_element_type=jnp.bfloat16)
        out = tap if out is None else out + tap
    return out.astype(jnp.float32)


def wn_stack(conv_fn, params, x):
    """The WN hot loop (ops/coupling.py WN.__call__ minus start/end convs)."""
    import jax
    import jax.numpy as jnp
    h = x
    skip = jnp.zeros_like(x)
    for (wc, bc, wr, br), d in zip(params, DILATIONS):
        h = jax.nn.softplus(conv_fn(h, wc, d) + bc)
        rs = jax.nn.softplus(
            (h.astype(jnp.bfloat16) @ wr.astype(jnp.bfloat16)
             ).astype(jnp.float32) + br)
        skip = skip + rs
    return h, skip


# ---- variant C: Pallas fused dilated conv + softplus -----------------------
def pallas_conv_softplus(x, w, b, dilation, block_cout=512):
    """softplus(conv1d(x, w, dilation) + b) as one Pallas kernel.

    x (B, T, C) f32/bf16, w (K, C, C) f32 -> (B, T, C) f32.
    Grid (Cout/block outer, B inner): the (K, C, block) weight slab stays
    VMEM-resident across the whole batch sweep; each program reads one
    padded row (T+2p, C) and does K MXU dots with f32 accumulation, fusing
    bias + softplus on the way out — the elementwise epilogue never touches
    HBM. This is the 'fused WN coupling kernel' asked for in rounds 2-4,
    scoped to the conv that owns the FLOPs (the 1x1 res_skip is already a
    plain matmul XLA runs at matmul speed; fusing it in would force the
    full 1024-wide h per program and blow the ~16 MB VMEM budget with
    double buffering).
    """
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, T, Cin = x.shape
    pad = dilation * (K - 1) // 2
    xp = jnp.pad(x.astype(jnp.bfloat16), ((0, 0), (pad, pad), (0, 0)))
    wb = w.astype(jnp.bfloat16)
    b2 = b.reshape(1, Cin)     # 2-D: 1-D blocks get non-standard layouts
    n_co = Cin // block_cout

    def kernel(x_ref, w_ref, b_ref, o_ref):
        xr = x_ref[0]                                   # (T+2p, C) bf16
        acc = jnp.zeros((T, block_cout), jnp.float32)
        for i in range(K):
            # i, dilation static -> plain slice of the materialized block
            acc += jax.lax.dot_general(
                xr[i * dilation:i * dilation + T, :], w_ref[i],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        o_ref[0] = jax.nn.softplus(acc + b_ref[0]).astype(jnp.float32)

    return pl.pallas_call(
        kernel,
        grid=(n_co, B),
        in_specs=[
            pl.BlockSpec((1, T + 2 * pad, Cin), lambda co, b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K, Cin, block_cout), lambda co, b: (0, 0, co),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_cout), lambda co, b: (0, co),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, T, block_cout), lambda co, b: (b, 0, co),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, T, Cin), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * K * Cin * Cin * B * T,
            bytes_accessed=(B * (T + 2 * pad) * Cin * 2 * n_co
                            + K * Cin * Cin * 2 + B * T * Cin * 4),
            transcendentals=B * T * Cin),
    )(xp, wb, b2)


def wn_stack_pallas(params, x):
    import jax
    import jax.numpy as jnp
    h = x
    skip = jnp.zeros_like(x)
    for (wc, bc, wr, br), d in zip(params, DILATIONS):
        h = pallas_conv_softplus(h, wc, bc, d)
        rs = jax.nn.softplus(
            (h.astype(jnp.bfloat16) @ wr.astype(jnp.bfloat16)
             ).astype(jnp.float32) + br)
        skip = skip + rs
    return h, skip


def timeit(fn, *args, iters=30):
    import jax
    r = fn(*args)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn(*args)
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--t", type=int, default=256)
    ap.add_argument("--iters", type=int, default=30)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_bench_cache")
    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])

    B, T = args.batch, args.t
    rng = np.random.default_rng(0)
    params = make_params(rng)
    x = jnp.asarray(rng.standard_normal((B, T, C)), jnp.float32)

    fwd_flops = stack_flops(B, T)
    # train-style: fwd + dgrad + wgrad ~= 3x fwd flops
    grad_flops = 3 * fwd_flops

    def loss_of(stack_fn):
        def f(params, x):
            h, skip = stack_fn(params, x)
            return jnp.sum(h * h) + jnp.sum(skip * skip)
        return f

    results = {}
    rows = []

    fwdA = jax.jit(functools.partial(wn_stack, conv_lax))
    fwdB = jax.jit(functools.partial(wn_stack, conv_matmul))
    fwdC = jax.jit(wn_stack_pallas)

    # parity check first (bf16 tolerances)
    hA, sA = fwdA(params, x)
    hB, sB = fwdB(params, x)
    err_b = float(jnp.max(jnp.abs(hA - hB)))
    try:
        hC, sC = fwdC(params, x)
        err_c = float(jnp.max(jnp.abs(hA - hC)))
        pallas_ok = True
    except Exception as e:  # pallas unavailable / compile failure: report
        print(f"pallas variant failed: {type(e).__name__}: {e}")
        pallas_ok = False
        err_c = float("nan")
    print(f"max|A-B| = {err_b:.3e}   max|A-C| = {err_c:.3e}")

    for name, fn in [("A_lax_conv", fwdA), ("B_shift_matmul", fwdB)] + (
            [("C_pallas_fused", fwdC)] if pallas_ok else []):
        s = timeit(fn, params, x, iters=args.iters)
        tf = fwd_flops / s / 1e12
        rows.append((f"fwd  {name}", s * 1e3, tf, tf * 1e12 / PEAK))
        results[f"wn_fwd_{name}_ms"] = round(s * 1e3, 3)
        results[f"wn_fwd_{name}_tfs"] = round(tf, 1)

    for name, stack_fn in [("A_lax_conv",
                            functools.partial(wn_stack, conv_lax)),
                           ("B_shift_matmul",
                            functools.partial(wn_stack, conv_matmul))]:
        g = jax.jit(jax.value_and_grad(loss_of(stack_fn)))
        s = timeit(g, params, x, iters=args.iters)
        tf = grad_flops / s / 1e12
        rows.append((f"grad {name}", s * 1e3, tf, tf * 1e12 / PEAK))
        results[f"wn_grad_{name}_ms"] = round(s * 1e3, 3)
        results[f"wn_grad_{name}_tfs"] = round(tf, 1)

    print(f"\nWN 4-layer stack, B={B} T={T} C={C} k={K} d={DILATIONS}, "
          f"fwd {fwd_flops / 1e9:.1f} GF")
    print(f"{'variant':24s} {'ms':>8s} {'TF/s':>7s} {'%peak':>6s}")
    for name, ms, tf, frac in rows:
        print(f"{name:24s} {ms:8.3f} {tf:7.1f} {frac:6.1%}")
    print(json.dumps(results))


if __name__ == "__main__":
    main()
