"""Pallas TPU kernels for the CTC alpha/beta DPs (losses/ctc.py).

The lax.scan CTC runs 2x(T_mel-1) sequential XLA steps, each a handful of
small (B, 2S+1) VPU kernels with per-step buffer shuffling. Here each DP
runs as ONE kernel: the band state lives in VMEM scratch across a
time-chunked sequential grid (same structure as ops/alignment.py's MAS
kernel), and every row is pure resident VPU arithmetic. Emissions stream
through VMEM blocks (double-buffered by the pipeline), the (T, B, 2S+1)
alpha/beta stacks stream back out for the posterior gradient.

Numerical semantics match ctc._alpha_scan / ctc._ctc_bwd's beta scan
exactly (same band recurrences, same freeze/terminal rules); parity is
asserted in tests/test_alignment.py against the scan path.
"""
from __future__ import annotations

import functools

import jax
import jax.lax as lax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -1e30


def _lse3(a, b, c):
    m = jnp.maximum(jnp.maximum(a, b), c)
    return m + jnp.log(jnp.exp(a - m) + jnp.exp(b - m) + jnp.exp(c - m))


def _alpha_kernel(emit_ref, mlens_ref, svalid_ref, skip_ref, out_ref, a_scr):
    """One grid step = one chunk of mel rows; alpha band carried in VMEM.

    emit: (chunk, B, L) per-state emissions; mlens/svalid/skip: (B, L)
    broadcast mel lengths, state-validity {0,1}, skip-into-state
    {0, NEG_INF}. out: (chunk, B, L) alpha rows (frozen past mel_len,
    matching the scan's carry-forward).
    """
    step = pl.program_id(0)
    chunk = emit_ref.shape[0]
    B, L = a_scr.shape
    lane = lax.broadcasted_iota(jnp.int32, (B, L), 1)
    svalid = svalid_ref[:]

    def row(t, _):
        i = step * chunk + t  # global mel row

        @pl.when(i == 0)
        def _():
            # alpha0: states {blank0, first label} only (masks in f32
            # arithmetic; NEG_INF is finite so 0*NEG_INF == 0, no NaN)
            ok = jnp.where(lane <= 1, 1.0, 0.0) * svalid
            a_scr[:] = ok * emit_ref[t] + (1.0 - ok) * _NEG_INF

        @pl.when(i > 0)
        def _():
            a = a_scr[:]
            p1 = pltpu.roll(a, 1, axis=1)
            p1 = jnp.where(lane == 0, _NEG_INF, p1)
            p2 = pltpu.roll(a, 2, axis=1)
            p2 = jnp.where(lane <= 1, _NEG_INF, p2) + skip_ref[:]
            na = _lse3(a, p1, p2) + emit_ref[t]
            na = svalid * na + (1.0 - svalid) * _NEG_INF
            rv = (mlens_ref[:] > i).astype(jnp.float32)  # freeze past len
            a_scr[:] = rv * na + (1.0 - rv) * a

        out_ref[t] = a_scr[:]
        return 0

    lax.fori_loop(0, chunk, row, 0)


def _beta_kernel(emit_ref, mlens_ref, term_ref, skip_ref, out_ref, q_scr):
    """Reverse beta DP; grid streams time chunks in reverse via index_map.

    Carry q = beta(t+1) + emit(t+1) lives in VMEM scratch; term: (B, L)
    terminal row {0, NEG_INF} at states {2*tl, 2*tl-1}. Rows with
    i >= mel_len-1 are forced terminal (matches the scan), so junk from
    the padded top rows never propagates.
    """
    step = pl.program_id(0)
    nblk = pl.num_programs(0)
    chunk = emit_ref.shape[0]
    B, L = q_scr.shape
    lane = lax.broadcasted_iota(jnp.int32, (B, L), 1)
    term = term_ref[:]

    @pl.when(step == 0)
    def _():
        # top rows are forced terminal below, but cand is still computed
        # from q_scr — init to a finite band so 0*cand can't be 0*NaN
        q_scr[:] = term

    def row(k, _):
        t = chunk - 1 - k
        i = (nblk - 1 - step) * chunk + t
        q = q_scr[:]
        n1 = pltpu.roll(q, L - 1, axis=1)              # q[s+1]
        n1 = jnp.where(lane == L - 1, _NEG_INF, n1)
        n2 = pltpu.roll(q, L - 2, axis=1)              # q[s+2]
        n2 = jnp.where(lane >= L - 2, _NEG_INF, n2) + skip_ref[:]
        cand = _lse3(q, n1, n2)
        rv = (mlens_ref[:] - 1 > i).astype(jnp.float32)  # i < mel_len-1
        beta = rv * cand + (1.0 - rv) * term
        out_ref[t] = beta
        q_scr[:] = beta + emit_ref[t]
        return 0

    lax.fori_loop(0, chunk, row, 0)


def _prep(emit_all, text_lens, mel_lens, chunk):
    """(B, T, S) emissions -> time-major lane-padded blocks + masks."""
    B, T, S = emit_all.shape
    L = max(128, ((S + 127) // 128) * 128)
    Tp = ((T + chunk - 1) // chunk) * chunk
    emit = jnp.pad(jnp.swapaxes(emit_all, 0, 1),
                   ((0, Tp - T), (0, 0), (0, L - S)),
                   constant_values=_NEG_INF)                 # (Tp, B, L)
    lanes = jnp.arange(L)
    svalid = (lanes[None, :] <= 2 * text_lens[:, None]).astype(jnp.float32)
    skip = jnp.where(lanes[None, :] % 2 == 1, 0.0, _NEG_INF)
    skip = jnp.broadcast_to(skip, (B, L))
    mlens = jnp.broadcast_to(mel_lens[:, None], (B, L)).astype(jnp.int32)
    return emit, mlens, svalid, skip, L, Tp


@functools.partial(jax.jit, static_argnames=("chunk",))
def ctc_alpha_pallas(emit_all, text_lens, mel_lens, chunk: int = 64):
    """emit_all: (B, T_mel, n_states). Returns alphas (T_mel, B, n_states),
    rows frozen past each item's mel_len (scan-carry semantics)."""
    B, T, S = emit_all.shape
    emit, mlens, svalid, skip, L, Tp = _prep(emit_all, text_lens, mel_lens,
                                             chunk)
    grid = (Tp // chunk,)
    alphas = pl.pallas_call(
        _alpha_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((chunk, B, L), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B, L), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((B, L), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((B, L), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((chunk, B, L), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Tp, B, L), jnp.float32),
        scratch_shapes=[pltpu.VMEM((B, L), jnp.float32)],
        interpret=jax.default_backend() != "tpu",
    )(emit.astype(jnp.float32), mlens, svalid, skip)
    return alphas[:T, :, :S]


@functools.partial(jax.jit, static_argnames=("chunk",))
def ctc_beta_pallas(emit_all, text_lens, mel_lens, chunk: int = 64):
    """emit_all: (B, T_mel, n_states). Returns betas (T_mel, B, n_states)
    with rows >= mel_len-1 at the terminal band (scan semantics)."""
    B, T, S = emit_all.shape
    emit, mlens, svalid, skip, L, Tp = _prep(emit_all, text_lens, mel_lens,
                                             chunk)
    lanes = jnp.arange(L)
    term = jnp.where(
        (lanes[None, :] == 2 * text_lens[:, None])
        | (lanes[None, :] == 2 * text_lens[:, None] - 1), 0.0, _NEG_INF)
    nblk = Tp // chunk
    betas = pl.pallas_call(
        _beta_kernel,
        grid=(nblk,),
        in_specs=[
            pl.BlockSpec((chunk, B, L), lambda i, n=nblk: (n - 1 - i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B, L), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((B, L), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((B, L), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((chunk, B, L),
                               lambda i, n=nblk: (n - 1 - i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Tp, B, L), jnp.float32),
        scratch_shapes=[pltpu.VMEM((B, L), jnp.float32)],
        interpret=jax.default_backend() != "tpu",
    )(emit.astype(jnp.float32), mlens, term, skip)
    return betas[:T, :, :S]
