"""Deterministic attribute predictors (F0 / energy / voiced / duration).

Reference: attribute_predictors.py:27-227 + the ConvLSTMLinear backbone
(common.py:240-333). A bottleneck conv compresses text encodings 520->32,
speaker (16) and accent (8) vectors are broadcast over time and concatenated,
then a conv->BiLSTM->linear backbone predicts the per-frame attribute.

Target transforms (tx/inv_tx, attribute_predictors.py:64-133) are pure
functions so the predictors stay stateless.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from radmmm_tpu.ops.conv import MaskedConv1d, Linear
from radmmm_tpu.ops.lstm import MaskedLSTM
from radmmm_tpu.utils.masking import SeqLens


def tx_target(x, target_scale=1.0, target_offset=0.0, log_target=False,
              normalize_target=False, normalization_type=None,
              x_mean=None, x_std=None):
    """Forward target transform (attribute_predictors.py:64-106).

    x: (B, T, 1); x_mean/x_std: (B,) speaker stats.
    """
    if normalize_target:
        assert normalization_type is not None
        if normalization_type == "norm_lin_space":
            # NOTE: reproduces the reference expression verbatim
            # (x - mean/std, attribute_predictors.py:74) — precedence and all.
            x = x - (x_mean / x_std)[:, None, None]
            x = jnp.log(x + 10.0) / 3.0
        elif normalization_type == "norm_log_space":
            x = (x - x_mean[:, None, None]) / x_std[:, None, None]
            x = (x + 5.0) / 10.0
        return x
    x = x * target_scale + target_offset
    if log_target:
        x = jnp.log(x + 1.0)
    return x


def inv_tx_target(x, target_scale=1.0, target_offset=0.0, log_target=False,
                  normalize_target=False, normalization_type=None,
                  x_mean=None, x_std=None):
    """Inverse transform (attribute_predictors.py:108-133)."""
    if normalize_target and x_mean is not None and x_std is not None:
        if normalization_type == "norm_lin_space":
            x = jnp.exp(x * 3.0) - 10.0
            return x * x_std[:, None, None] + x_mean[:, None, None]
        if normalization_type == "norm_log_space":
            x = x * 10.0 - 5.0
            return x * x_std[:, None, None] + x_mean[:, None, None]
        return x
    if log_target:
        x = jnp.exp(x) - 1.0
    return (x - target_offset) / target_scale


class BottleneckLayer(nn.Module):
    """Dim-reduction conv + nonlinearity (attribute_predictors.py:27-51)."""
    in_dim: int
    reduction_factor: int = 16
    kernel_size: int = 3
    non_linearity: str = "leakyrelu"

    @property
    def out_dim(self):
        return (self.in_dim // self.reduction_factor
                if self.reduction_factor > 1 else self.in_dim)

    @nn.compact
    def __call__(self, x, mask=None):
        if self.reduction_factor > 1:
            # premask_input=False: the reference's bottleneck ConvNorm is
            # non-partial and does not pre-zero its input, so the last valid
            # frame convolves over the (nonzero) first padded context frame
            # (common.py:180-190 via attribute_predictors.py:46-51) —
            # verified by full-model gradient parity
            # (tests/test_reference_parity_training.py)
            x = MaskedConv1d(self.in_dim // self.reduction_factor,
                             self.kernel_size, use_weight_norm=True,
                             premask_input=False, name="proj")(x, mask)
            x = (jax.nn.leaky_relu(x, 0.01)
                 if self.non_linearity == "leakyrelu" else jax.nn.relu(x))
        return x


class ConvLSTMLinear(nn.Module):
    """conv stack -> (Bi)LSTM (spectral norm) -> linear (common.py:240-333).

    `spectral_norm=False` is the `remove_norms` inference configuration
    (models/radmmm.py:150-168).
    """
    out_dim: int
    n_layers: int = 2
    n_channels: int = 256
    kernel_size: int = 3
    p_dropout: float = 0.1
    lstm_type: Optional[str] = "bilstm"
    use_linear: bool = True
    spectral_norm: bool = True

    @nn.compact
    def __call__(self, x, lens: SeqLens, train: bool = True,
                 phase: str = "all"):
        """phase: 'all' (default) runs the whole stack. 'pre' runs the conv
        stack and returns (conv_out, lstm_weights) so the caller can gang
        several same-shape BiLSTMs into one multi_bilstm_scan; 'post' takes
        the external LSTM output and applies the output linear. Parameter
        tree and checkpoint layout are identical in both modes."""
        n_channels = self.n_channels if self.use_linear else self.out_dim
        if phase in ("all", "pre"):
            for i in range(self.n_layers):
                x = MaskedConv1d(n_channels, self.kernel_size,
                                 w_init_gain="relu", use_weight_norm=True,
                                 name=f"conv_{i}")(x, lens.mask)
                x = jax.nn.relu(x)
                x = nn.Dropout(self.p_dropout, deterministic=not train)(x)
            if self.lstm_type:
                bi = self.lstm_type == "bilstm"
                hidden = n_channels // 2 if bi else n_channels
                lstm = MaskedLSTM(hidden, bidirectional=bi,
                                  spectral_norm=self.spectral_norm,
                                  name="lstm")
                if phase == "pre":
                    return x, lstm(x, lens.mask, update_sn=train,
                                   return_weights=True)
                x = lstm(x, lens.mask, update_sn=train)
            elif phase == "pre":
                return x, None
        if self.use_linear:
            x = Linear(self.out_dim, name="dense")(x)
        return x


class LSTMConv(nn.Module):
    """BiLSTM first, then a conv stack (LSTMConv, common.py:340-395).

    Last conv has no activation; optional masked batch norm per conv.
    """
    out_dim: int
    n_layers: int = 3
    n_channels: int = 512
    kernel_size: int = 3
    p_dropout: float = 0.1
    use_bn: bool = False
    lstm_norm_fn: Optional[str] = "spectral"

    @nn.compact
    def __call__(self, x, lens: SeqLens, train: bool = True):
        from radmmm_tpu.ops.norms import MaskedBatchNorm
        assert self.n_channels % 2 == 0
        x = MaskedLSTM(self.n_channels // 2, bidirectional=True,
                       spectral_norm=(self.lstm_norm_fn is not None
                                      and "spectral" in self.lstm_norm_fn),
                       name="lstm")(x, lens.mask, update_sn=train)
        for i in range(self.n_layers):
            out_ch = (self.out_dim if i == self.n_layers - 1
                      else self.n_channels)
            x = MaskedConv1d(out_ch, self.kernel_size, w_init_gain="relu",
                             use_weight_norm=True,
                             name=f"conv_{i}")(x, lens.mask)
            if self.use_bn:
                x = MaskedBatchNorm(out_ch, name=f"bn_{i}")(
                    x, lens.mask, train=train)
            if i < self.n_layers - 1:
                x = jax.nn.relu(x)
                x = nn.Dropout(self.p_dropout,
                               deterministic=not train)(x)
        return x


class ResidualLSTMConv(nn.Module):
    """LSTMConv with a 0.5-scaled residual (common.py:398-420)."""
    out_dim: int
    n_layers: int = 3
    n_hidden_channels: int = 512
    kernel_size: int = 3
    use_residual: bool = True
    use_bn: bool = False
    lstm_norm_fn: Optional[str] = "spectral"

    @nn.compact
    def __call__(self, x, lens: SeqLens, train: bool = True):
        x_enc = LSTMConv(self.out_dim, self.n_layers,
                         self.n_hidden_channels, self.kernel_size,
                         use_bn=self.use_bn,
                         lstm_norm_fn=self.lstm_norm_fn,
                         name="lstm_conv")(x, lens, train=train)
        if self.use_residual:
            assert x.shape[-1] == self.out_dim
            x_enc = (x_enc + x) * 0.5
        return x_enc


class ConvLSTMLinearDAP(nn.Module):
    """Deterministic attribute predictor (attribute_predictors.py:142-197).

    __call__ returns {'x_hat', 'x'}; `infer` applies the inverse transform.
    """
    n_speaker_dim: int = 16
    n_accent_dim: int = 0
    in_dim: int = 512
    out_dim: int = 1
    reduction_factor: int = 16
    n_backbone_layers: int = 2
    n_hidden: int = 256
    kernel_size: int = 3
    p_dropout: float = 0.25
    target_scale: float = 1.0
    target_offset: float = 0.0
    log_target: bool = False
    lstm_type: Optional[str] = "bilstm"
    use_speaker_embedding: bool = True
    use_accent_embedding: bool = False
    normalize_target: bool = False
    normalization_type: Optional[str] = None

    def _tx_kwargs(self):
        return dict(target_scale=self.target_scale,
                    target_offset=self.target_offset,
                    log_target=self.log_target,
                    normalize_target=self.normalize_target,
                    normalization_type=self.normalization_type)

    @nn.compact
    def __call__(self, x_target, text_enc, spk_emb, lens: SeqLens,
                 x_mean=None, x_std=None, accent_emb=None, train=True,
                 phase: str = "all", lstm_out=None):
        """phase='pre'/'post' splits the predictor around its BiLSTM so the
        top-level model can gang several predictors' recurrences into one
        scan (multi_bilstm_scan): 'pre' returns
        {'x': tx_target, 'conv': conv_out, 'lstm': stacked weights};
        'post' consumes lstm_out and returns the usual {'x_hat', 'x'}."""
        backbone = ConvLSTMLinear(self.out_dim, self.n_backbone_layers,
                                  self.n_hidden, self.kernel_size,
                                  self.p_dropout, self.lstm_type,
                                  name="backbone")
        if phase == "post":
            x_hat = backbone(lstm_out, lens, train=train, phase="post")
            return {"x_hat": x_hat, "x": x_target}
        if x_target is not None:
            x_target = tx_target(x_target, x_mean=x_mean, x_std=x_std,
                                 **self._tx_kwargs())
        h = BottleneckLayer(self.in_dim, self.reduction_factor,
                            name="bottleneck")(text_enc, lens.mask)
        T = text_enc.shape[1]
        parts = [h]
        if self.use_speaker_embedding:
            parts.append(jnp.broadcast_to(
                spk_emb[:, None, :], (h.shape[0], T, spk_emb.shape[-1])))
        if self.use_accent_embedding:
            parts.append(jnp.broadcast_to(
                accent_emb[:, None, :],
                (h.shape[0], T, accent_emb.shape[-1])))
        h = jnp.concatenate(parts, axis=-1)
        if phase == "pre":
            conv, ws = backbone(h, lens, train=train, phase="pre")
            return {"x": x_target, "conv": conv, "lstm": ws}
        x_hat = backbone(h, lens, train=train)
        return {"x_hat": x_hat, "x": x_target}

    def infer(self, text_enc, spk_emb, lens: SeqLens, x_mean=None,
              x_std=None, accent_emb=None):
        out = self(None, text_enc, spk_emb, lens, accent_emb=accent_emb,
                   train=False)
        return inv_tx_target(out["x_hat"], x_mean=x_mean, x_std=x_std,
                             **self._tx_kwargs())

    def inv_tx(self, x_hat, x_mean=None, x_std=None):
        """Inverse target transform (used by the ganged inference path)."""
        return inv_tx_target(x_hat, x_mean=x_mean, x_std=x_std,
                             **self._tx_kwargs())


class LSTMConvDAP(nn.Module):
    """Attribute predictor with an LSTM-first backbone
    (attribute_predictors.py:200-227)."""
    n_speaker_dim: int = 16
    in_dim: int = 512
    out_dim: int = 1
    reduction_factor: int = 16
    n_backbone_layers: int = 2
    n_hidden: int = 256
    kernel_size: int = 3
    p_dropout: float = 0.25
    target_scale: float = 1.0
    target_offset: float = 0.0
    log_target: bool = False
    lstm_norm_fn: str = "spectral"

    def _tx_kwargs(self):
        return dict(target_scale=self.target_scale,
                    target_offset=self.target_offset,
                    log_target=self.log_target)

    @nn.compact
    def __call__(self, x_target, text_enc, spk_emb, lens: SeqLens,
                 x_mean=None, x_std=None, accent_emb=None, train=True):
        # x_mean/x_std/accent_emb accepted for DAP-interface uniformity;
        # this backbone is speaker-only (attribute_predictors.py:200-227)
        if x_target is not None:
            x_target = tx_target(x_target, **self._tx_kwargs())
        h = BottleneckLayer(self.in_dim, self.reduction_factor,
                            name="bottleneck")(text_enc, lens.mask)
        T = text_enc.shape[1]
        spk = jnp.broadcast_to(spk_emb[:, None, :],
                               (h.shape[0], T, spk_emb.shape[-1]))
        h = jnp.concatenate([h, spk], axis=-1)
        x_hat = LSTMConv(self.out_dim, self.n_backbone_layers,
                         self.n_hidden, self.kernel_size, self.p_dropout,
                         lstm_norm_fn=self.lstm_norm_fn,
                         name="backbone")(h, lens, train=train)
        return {"x_hat": x_hat, "x": x_target}

    def infer(self, text_enc, spk_emb, lens: SeqLens, x_mean=None,
              x_std=None, accent_emb=None):
        out = self(None, text_enc, spk_emb, lens, train=False)
        return inv_tx_target(out["x_hat"], **self._tx_kwargs())
