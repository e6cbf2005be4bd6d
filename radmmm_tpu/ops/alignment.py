"""Monotonic alignment search (MAS), batched and on-device.

The reference binarizes attention by copying it to host memory and running a
numba-JIT Viterbi per item (alignment.py:31-59 driven from
tts_lightning_modules.py:270-284 — a device->host->device round trip in the
middle of every training step once binarization starts). Here the DP runs as
a lax.scan over mel frames with the whole batch and text axis vectorized on
the VPU, and the backtrack as a reverse scan — no host transfer.

Semantics matched exactly, including the tie-break (prefer j-1 when
log_p[i-1,j-1] >= log_p[i-1,j], alignment.py:46) and the final
opt[0, 0] = 1 write (alignment.py:58).

Width-1 monotonic: each mel frame attends one text token; token index is
non-decreasing and advances by at most 1 per frame.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

_NEG_INF = -1e30

# MAS backend: 'pallas' runs the whole Viterbi DP + backtrack as ONE TPU
# kernel with the lattice resident in VMEM (no per-row scan overhead);
# 'scan' is the portable lax.scan path (CPU tests, interpret mode).
import os as _os
_MAS_BACKEND = _os.environ.get("RADMMM_MAS_BACKEND", "auto")


def set_mas_backend(backend: str) -> None:
    """'auto' (pallas on TPU, scan elsewhere) | 'pallas' | 'scan'."""
    global _MAS_BACKEND
    assert backend in ("auto", "pallas", "scan")
    _MAS_BACKEND = backend


def _use_pallas() -> bool:
    if _MAS_BACKEND == "auto":
        return jax.default_backend() == "tpu"
    return _MAS_BACKEND == "pallas"


def _mas_kernel(logattn_ref, mlens_ref, start_ref, out_ref,
                logp_scr, choice_scr, cur_scr):
    """Whole-batch Viterbi DP + backtrack in one kernel, VMEM-resident.

    logattn: (T_mel, B, L) text-masked log attention with row 0 already
    restricted to token 0; mlens: (B, L) broadcast mel lengths;
    start: (B, L) one-hot of text_len-1. out: (T_mel, B, L) hard rows.
    The sequential DP is two fori_loops over mel rows — each iteration a
    few (B, L) VPU ops on resident data, instead of a lax.scan step with
    its per-iteration buffer shuffling.
    """
    import jax.lax as lax
    from jax.experimental.pallas import tpu as pltpu

    T_mel, B, L = logattn_ref.shape
    lane = lax.broadcasted_iota(jnp.int32, (B, L), 1)
    logp_scr[:] = logattn_ref[0]

    # all masks kept in f32 (Mosaic rejects i1-typed vector selects)
    def fwd(i, _):
        lp = logp_scr[:]
        shifted = pltpu.roll(lp, 1, axis=1)            # log_p[:, j-1]
        shifted = jnp.where(lane == 0, _NEG_INF, shifted)
        chose = (shifted >= lp).astype(jnp.float32)    # tie -> diagonal
        best = jnp.maximum(shifted, lp)
        rv = (mlens_ref[:] > i).astype(jnp.float32)    # (B, L) row valid
        logp_scr[:] = rv * (logattn_ref[i] + best) + (1.0 - rv) * lp
        choice_scr[i] = chose * rv
        return 0

    lax.fori_loop(1, T_mel, fwd, 0)

    cur_scr[:] = start_ref[:]

    def bwd(k, _):
        i = T_mel - 1 - k                              # rows T_mel-1 .. 1
        rv = (mlens_ref[:] > i).astype(jnp.float32)
        cur = cur_scr[:]
        out_ref[i] = cur * rv
        took = (jnp.sum(choice_scr[i] * cur, axis=1, keepdims=True)
                > 0.0).astype(jnp.float32)
        moved = pltpu.roll(cur, L - 1, axis=1)         # one-hot j -> j-1
        moved = jnp.where(lane == L - 1, 0.0, moved)
        gate = rv * took
        cur_scr[:] = gate * moved + (1.0 - gate) * cur
        return 0

    lax.fori_loop(0, T_mel - 1, bwd, 0)
    # row 0: current token, plus the reference's trailing opt[0, 0] = 1
    # write (alignment.py:58); zeroed for empty items
    valid0 = (mlens_ref[:] > 0).astype(jnp.float32)
    out_ref[0] = valid0 * jnp.maximum(cur_scr[:],
                                      (lane == 0).astype(jnp.float32))


def _mas_width1_pallas(attn_map, text_lens, mel_lens):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, T_mel, T_text = attn_map.shape
    L = max(128, ((T_text + 127) // 128) * 128)        # lane-pad text axis
    j = jnp.arange(L)
    text_valid = j[None, :] < text_lens[:, None]
    log_attn = jnp.where(
        text_valid[:, None, :],
        jnp.log(jnp.maximum(
            jnp.pad(attn_map, ((0, 0), (0, 0), (0, L - T_text))), 1e-45)),
        _NEG_INF)
    log_attn = jnp.swapaxes(log_attn, 0, 1)            # (T_mel, B, L)
    row0 = jnp.where(j[None, :] == 0, log_attn[0], _NEG_INF)
    log_attn = log_attn.at[0].set(row0)
    mlens = jnp.broadcast_to(mel_lens[:, None], (B, L)).astype(jnp.int32)
    start = jax.nn.one_hot(text_lens - 1, L, dtype=jnp.float32)

    out = pl.pallas_call(
        _mas_kernel,
        out_shape=jax.ShapeDtypeStruct((T_mel, B, L), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((B, L), jnp.float32),           # log_p row
            pltpu.VMEM((T_mel, B, L), jnp.float32),    # diag choices
            pltpu.VMEM((B, L), jnp.float32),           # backtrack one-hot
        ],
        interpret=jax.default_backend() != "tpu",      # CPU test support
    )(log_attn, mlens, start)
    opt = jnp.swapaxes(out, 0, 1)[..., :T_text]
    mel_valid = jnp.arange(T_mel)[None, :] < mel_lens[:, None]
    return (opt * mel_valid[:, :, None]).astype(attn_map.dtype)


@functools.partial(jax.jit, static_argnames=())
def mas_width1(attn_map: jax.Array, text_lens: jax.Array,
               mel_lens: jax.Array) -> jax.Array:
    """Batched width-1 MAS.

    attn_map: (B, T_mel, T_text) soft attention probabilities (>= 0).
    text_lens, mel_lens: (B,) valid lengths.
    Returns hard alignment (B, T_mel, T_text) in {0,1}, zero outside the
    valid region.
    """
    if _use_pallas():
        return _mas_width1_pallas(attn_map, text_lens, mel_lens)
    B, T_mel, T_text = attn_map.shape
    j = jnp.arange(T_text)
    text_valid = j[None, :] < text_lens[:, None]              # (B, Ttext)

    log_attn = jnp.where(text_valid[:, None, :],
                         jnp.log(jnp.maximum(attn_map, 1e-45)), _NEG_INF)
    # row 0: only token 0 reachable
    row0 = jnp.where(j[None, :] == 0, log_attn[:, 0, :], _NEG_INF)

    i_idx = jnp.arange(1, T_mel)
    mel_valid = i_idx[:, None] < mel_lens[None, :]            # (Tmel-1, B)

    def fwd(carry, inp):
        log_p = carry                                          # (B, Ttext)
        attn_row, row_valid = inp                              # (B,Ttext),(B,)
        shifted = jnp.pad(log_p, ((0, 0), (1, 0)),
                          constant_values=_NEG_INF)[:, :-1]    # log_p[:, j-1]
        chose_diag = shifted >= log_p                          # tie -> diag
        best = jnp.where(chose_diag, shifted, log_p)
        new_log_p = attn_row + best
        # past the end of the mel sequence: freeze (pass-through rows)
        rv = row_valid[:, None]
        new_log_p = jnp.where(rv, new_log_p, log_p)
        chose_diag = chose_diag & rv
        return new_log_p, chose_diag

    _, diag_choices = jax.lax.scan(
        fwd, row0, (jnp.swapaxes(log_attn[:, 1:], 0, 1), mel_valid))
    # diag_choices: (T_mel-1, B, T_text) for rows 1..T_mel-1

    def bwd(carry, inp):
        curr = carry                                           # (B,) int32
        chose_diag, row_valid = inp                            # for row i
        opt_row = jax.nn.one_hot(curr, T_text, dtype=attn_map.dtype)
        opt_row = opt_row * row_valid[:, None].astype(attn_map.dtype)
        took = jnp.take_along_axis(chose_diag, curr[:, None], axis=1)[:, 0]
        new_curr = jnp.where(row_valid, curr - took.astype(curr.dtype), curr)
        return new_curr, opt_row

    start = (text_lens - 1).astype(jnp.int32)
    row_valid_all = (jnp.arange(1, T_mel)[:, None]
                     < mel_lens[None, :])                      # (Tmel-1, B)
    curr0, opt_rows = jax.lax.scan(
        bwd, start, (diag_choices, row_valid_all), reverse=True)
    opt_rows = jnp.swapaxes(opt_rows, 0, 1)                    # (B,Tmel-1,Tt)

    opt0 = jax.nn.one_hot(curr0, T_text, dtype=attn_map.dtype)
    # reference's trailing write: opt[0, 0] = 1 (alignment.py:58)
    opt0 = jnp.maximum(opt0, jax.nn.one_hot(jnp.zeros_like(curr0), T_text,
                                            dtype=attn_map.dtype))
    opt0 = opt0 * (mel_lens > 0)[:, None].astype(attn_map.dtype)
    opt = jnp.concatenate([opt0[:, None, :], opt_rows], axis=1)
    # zero padding region
    opt = opt * text_valid[:, None, :].astype(attn_map.dtype)
    mel_valid_full = (jnp.arange(T_mel)[None, :]
                      < mel_lens[:, None])                     # (B, Tmel)
    opt = opt * mel_valid_full[:, :, None].astype(attn_map.dtype)
    return opt


def mas_width1_ref(attn_map: np.ndarray) -> np.ndarray:
    """Single-item numpy reference (test oracle), same algorithm as the
    numba kernel described in alignment.py:31-59."""
    T_mel, T_text = attn_map.shape
    log_attn = np.log(np.maximum(attn_map, 1e-45))
    log_attn[0, 1:] = -np.inf
    log_p = np.full_like(log_attn, -np.inf)
    log_p[0] = log_attn[0]
    prev_ind = np.zeros((T_mel, T_text), dtype=np.int64)
    for i in range(1, T_mel):
        for jj in range(T_text):
            prev_log, prev_j = log_p[i - 1, jj], jj
            if jj - 1 >= 0 and log_p[i - 1, jj - 1] >= log_p[i - 1, jj]:
                prev_log, prev_j = log_p[i - 1, jj - 1], jj - 1
            log_p[i, jj] = log_attn[i, jj] + prev_log
            prev_ind[i, jj] = prev_j
    opt = np.zeros_like(attn_map)
    curr = T_text - 1
    for i in range(T_mel - 1, -1, -1):
        opt[i, curr] = 1
        curr = prev_ind[i, curr]
    opt[0, curr] = 1
    return opt


def binarize_attention(attn_soft: jax.Array, text_lens: jax.Array,
                       mel_lens: jax.Array,
                       straight_through: bool = False) -> jax.Array:
    """Hard MAS alignment, fully DETACHED by default.

    The reference's binarize_attention runs under torch.no_grad
    (tts_lightning_modules.py:270-284) and training_step uses that detached
    hard attention for context/durations; the straight-through estimator is
    computed at :472 but discarded by the `_` unpack at :666-668. Gradient
    parity therefore requires the detached form. straight_through=True
    reproduces the (unused) :472 estimator for completeness.
    """
    hard = jax.lax.stop_gradient(
        mas_width1(jax.lax.stop_gradient(attn_soft), text_lens, mel_lens))
    if straight_through:
        return attn_soft + jax.lax.stop_gradient(hard - attn_soft)
    return hard
