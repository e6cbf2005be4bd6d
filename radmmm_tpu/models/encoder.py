"""Text encoder: conv bank + BiLSTM (Tacotron-style).

Reference: common.py:425-504 — three (partial-padded, weight-normed conv ->
instance norm) blocks with relu+dropout(0.5), then a bidirectional LSTM over
packed sequences, optional spectral norm on the recurrent weights.

TPU re-design: the reference runs the convs in a per-item Python loop
("TODO: improve speed", common.py:470); here everything is a masked batched
conv (mathematically identical — see ops/conv.py) and the LSTM is a masked
lax.scan (ops/lstm.py).
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from radmmm_tpu.ops.conv import MaskedConv1d
from radmmm_tpu.ops.norms import MaskedInstanceNorm1d
from radmmm_tpu.ops.lstm import MaskedLSTM


class TextEncoder(nn.Module):
    encoder_n_convolutions: int = 3
    encoder_embedding_dim: int = 512
    encoder_kernel_size: int = 5
    lstm_norm_fn: Optional[str] = None  # 'spectral' | 'weight' | None
    p_dropout: float = 0.5  # the reference hardcodes 0.5 (common.py:473-479)

    @nn.compact
    def __call__(self, x: jax.Array, mask: Optional[jax.Array] = None,
                 train: bool = True) -> jax.Array:
        """x: (B, T_text, C) embedded text (+accent). Returns (B, T, C)."""
        for i in range(self.encoder_n_convolutions):
            x = MaskedConv1d(self.encoder_embedding_dim,
                             self.encoder_kernel_size,
                             w_init_gain="relu", use_partial_padding=True,
                             use_weight_norm=True, name=f"conv_{i}")(x, mask)
            x = MaskedInstanceNorm1d(self.encoder_embedding_dim,
                                     name=f"norm_{i}")(x, mask)
            x = jax.nn.relu(x)
            x = nn.Dropout(self.p_dropout, deterministic=not train)(x)
        x = MaskedLSTM(self.encoder_embedding_dim // 2, bidirectional=True,
                       spectral_norm=(self.lstm_norm_fn == "spectral"),
                       name="lstm")(x, mask, update_sn=train)
        return x
