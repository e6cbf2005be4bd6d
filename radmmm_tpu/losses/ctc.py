"""Attention CTC ("ForwardSum") loss, batched log-domain DP.

The reference loops over the batch calling torch's cuDNN CTC per item with
target sequence [1..key_len] and a prepended blank column at logprob -1
(loss.py:112-141). Because every label is distinct, the generic CTC
recursion specializes cleanly; here it is one lax.scan over mel frames with
the (batch, 2S+1 states) axes vectorized — no per-item loop, no dynamic
shapes.

States s in [0, 2S]: even = blank (attn column 0), odd s -> label (s+1)/2
(attn column (s+1)/2). Final loss per item = -logsumexp(alpha[2S], alpha[2S-1]),
divided by target length (torch CTCLoss reduction='mean' semantics for a
batch of one), then averaged over items.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

_NEG_INF = -1e30


def _masked_log_softmax(x, valid, axis):
    x = jnp.where(valid, x, _NEG_INF)
    m = jnp.max(x, axis=axis, keepdims=True)
    e = jnp.where(valid, jnp.exp(x - m), 0.0)
    lse = jnp.log(jnp.sum(e, axis=axis, keepdims=True)) + m
    return jnp.where(valid, x - lse, _NEG_INF)


@functools.partial(jax.jit, static_argnames=("blank_logprob",))
def attention_ctc_loss(attn_logprob: jax.Array, text_lens: jax.Array,
                       mel_lens: jax.Array,
                       blank_logprob: float = -1.0) -> jax.Array:
    """attn_logprob: (B, T_mel, T_text) unnormalized log-probs
    (post prior). Returns scalar loss (mean over batch)."""
    B, T_mel, T_text = attn_logprob.shape
    S = T_text                       # max target length
    n_states = 2 * S + 1

    # prepend blank column, log_softmax over [blank] + valid text columns
    logp = jnp.concatenate(
        [jnp.full((B, T_mel, 1), blank_logprob, attn_logprob.dtype),
         attn_logprob], axis=-1)
    cols = jnp.arange(T_text + 1)
    col_valid = cols[None, :] <= text_lens[:, None]     # blank + first S cols
    logp = _masked_log_softmax(logp, col_valid[:, None, :], axis=-1)

    s = jnp.arange(n_states)
    is_label = (s % 2) == 1
    col_of_state = jnp.where(is_label, (s + 1) // 2, 0)  # (2S+1,)
    state_valid = s[None, :] <= 2 * text_lens[:, None]   # (B, 2S+1)

    # hoist the per-state emission gather out of the serial DP: one
    # vectorized gather over ALL frames (B, T_mel, 2S+1), so the scan body
    # is pure banded arithmetic (the per-step gather was the dominant cost
    # of the 511-iteration loop at the bench shapes)
    emit_all = jnp.take_along_axis(
        logp, jnp.broadcast_to(col_of_state[None, None, :],
                               (B, T_mel, n_states)), axis=2)

    # alpha_0: blank0 or first label
    alpha0 = jnp.where((s[None, :] <= 1) & state_valid, emit_all[:, 0],
                       _NEG_INF)

    skip_block = jnp.where(is_label[None, :], 0.0, _NEG_INF)  # (1, 2S+1)

    def step(alpha, inp):
        emit_t, t_valid = inp                            # (B, 2S+1), (B,)
        prev1 = jnp.pad(alpha, ((0, 0), (1, 0)),
                        constant_values=_NEG_INF)[:, :-1]
        # skip transition only into label states (distinct labels)
        prev2 = jnp.pad(alpha, ((0, 0), (2, 0)),
                        constant_values=_NEG_INF)[:, :-2] + skip_block
        # fused 3-way logsumexp over the band (one exp/log round)
        m = jnp.maximum(jnp.maximum(alpha, prev1), prev2)
        acc = m + jnp.log(jnp.exp(alpha - m) + jnp.exp(prev1 - m)
                          + jnp.exp(prev2 - m))
        new_alpha = jnp.where(state_valid, acc + emit_t, _NEG_INF)
        new_alpha = jnp.where(t_valid[:, None], new_alpha, alpha)
        return new_alpha, None

    t_idx = jnp.arange(1, T_mel)
    t_valid = t_idx[:, None] < mel_lens[None, :]         # (T_mel-1, B)
    alpha, _ = jax.lax.scan(step, alpha0,
                            (jnp.swapaxes(emit_all[:, 1:], 0, 1), t_valid),
                            unroll=8)

    def lse2(a, b):
        m = jnp.maximum(a, b)
        return m + jnp.log(jnp.exp(a - m) + jnp.exp(b - m))

    end_blank = jnp.take_along_axis(alpha, (2 * text_lens)[:, None],
                                    axis=1)[:, 0]
    end_label = jnp.take_along_axis(alpha, (2 * text_lens - 1)[:, None],
                                    axis=1)[:, 0]
    ll = lse2(end_blank, end_label)
    per_item = -ll / jnp.maximum(text_lens.astype(ll.dtype), 1.0)
    # zero_infinity=True semantics
    per_item = jnp.where(jnp.isfinite(per_item) & (per_item < 1e29),
                         per_item, 0.0)
    return jnp.mean(per_item)
