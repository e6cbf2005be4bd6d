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


@functools.partial(jax.jit, static_argnames=())
def mas_width1(attn_map: jax.Array, text_lens: jax.Array,
               mel_lens: jax.Array) -> jax.Array:
    """Batched width-1 MAS.

    attn_map: (B, T_mel, T_text) soft attention probabilities (>= 0).
    text_lens, mel_lens: (B,) valid lengths.
    Returns hard alignment (B, T_mel, T_text) in {0,1}, zero outside the
    valid region.
    """
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
                       mel_lens: jax.Array) -> jax.Array:
    """Hard MAS alignment with straight-through gradient
    (tts_lightning_modules.py:470-472)."""
    hard = mas_width1(jax.lax.stop_gradient(attn_soft), text_lens, mel_lens)
    return attn_soft + jax.lax.stop_gradient(hard - attn_soft)
