"""Convolutional Gaussian alignment attention (ConvAttention).

Reference: common.py:1188-1277. Text keys and mel queries are projected by
small conv stacks; attention energy is the negative squared L2 distance
between projections scaled by temp=0.0005, log-softmaxed over the text axis
and combined with the log beta-binomial prior.

TPU notes: the (B, T_mel, T_text) energy is computed via the
|q|^2 + |k|^2 - 2 q·k expansion — one MXU batched matmul — instead of
materializing the (B, C, T_mel, T_text) difference tensor the reference
builds (common.py:1262).
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from radmmm_tpu.ops.conv import MaskedConv1d


class ConvAttention(nn.Module):
    n_mel_channels: int = 80
    n_text_channels: int = 512
    n_att_channels: int = 80
    temperature: float = 1.0  # kept for config parity; forward uses 0.0005

    @nn.compact
    def __call__(self, queries: jax.Array, keys: jax.Array,
                 key_mask: Optional[jax.Array] = None,
                 attn_prior: Optional[jax.Array] = None):
        """queries: (B, T_mel, n_mel); keys: (B, T_text, n_text_channels).

        Returns (attn (B, T_mel, T_text) softmaxed over text,
                 attn_logprob same shape).
        """
        temp = 0.0005
        k = MaskedConv1d(self.n_text_channels * 2, 3, w_init_gain="relu",
                         use_weight_norm=True, name="key_proj_0")(keys)
        k = jax.nn.relu(k)
        k = MaskedConv1d(self.n_att_channels, 1, use_weight_norm=True,
                         name="key_proj_1")(k)

        q = MaskedConv1d(self.n_mel_channels * 2, 3, w_init_gain="relu",
                         use_weight_norm=True, name="query_proj_0")(queries)
        q = jax.nn.relu(q)
        q = MaskedConv1d(self.n_mel_channels, 1, use_weight_norm=True,
                         name="query_proj_1")(q)
        q = jax.nn.relu(q)
        q = MaskedConv1d(self.n_att_channels, 1, use_weight_norm=True,
                         name="query_proj_2")(q)

        # -temp * ||q_t - k_s||^2 via the quadratic expansion (one bmm)
        q2 = jnp.sum(q * q, axis=-1)[:, :, None]
        k2 = jnp.sum(k * k, axis=-1)[:, None, :]
        qk = jnp.einsum("btc,bsc->bts", q, k,
                        precision=jax.lax.Precision.HIGHEST)
        attn = -temp * (q2 + k2 - 2.0 * qk)          # (B, T_mel, T_text)

        if attn_prior is not None:
            attn = jax.nn.log_softmax(attn, axis=-1) \
                + jnp.log(attn_prior + 1e-8)

        attn_logprob = attn

        if key_mask is not None:
            attn = jnp.where(key_mask[:, None, :], attn, -jnp.inf)
        attn = jax.nn.softmax(attn, axis=-1)
        return attn, attn_logprob
