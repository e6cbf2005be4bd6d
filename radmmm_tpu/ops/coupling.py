"""Coupling layers for the bipartite flow: parameter predictors + transforms.

Components and their reference equivalents (all re-laid-out channels-last and
fully batched/masked — no per-item loops):

* WN                      — non-causal dilated conv stack with partial
                            padding, softplus activations, zero-init output
                            (common.py:776-835).
* SimpleConvNet           — doubling-channel dilated conv stack, optional
                            zero-init 1x1 head (common.py:665-704).
* FiLMResBlock/FiLMStack  — FiLM-conditioned residual conv blocks with
                            MaskedBatchNorm (common.py:706-773).
* AffineCoupling          — split-half affine transform with
                            translate/exp/tanh/sigmoid scaling
                            (AffineTransformationLayer, common.py:1093-1185).
* SplineCoupling          — split-half quadratic/linear spline transform with
                            FiLM param predictor (SplineTransformationLayer,
                            common.py:1006-1090).
* SplineCouplingAR        — autoregressive variant conditioned on context
                            only (SplineTransformationLayerAR,
                            common.py:925-1003).

The fused add-tanh-sigmoid gate of WaveNet (common.py:66-73) is left to XLA
fusion — it fuses elementwise chains into the surrounding convs natively.
"""
from __future__ import annotations

from typing import Optional, Sequence, Union

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from radmmm_tpu.ops.conv import MaskedConv1d
from radmmm_tpu.ops.norms import MaskedBatchNorm
from radmmm_tpu.ops import splines as S


class WN(nn.Module):
    """WaveNet-style affine parameter predictor.

    in: (z_half (B,T,C_half), context (B,T,C_ctx)) -> (B, T, 2*C_half).
    """
    n_in_channels: int
    n_layers: int = 4
    n_channels: int = 1024
    kernel_size: int = 5
    affine_activation: str = "softplus"
    use_partial_padding: bool = True
    use_dilation: bool = True

    @nn.compact
    def __call__(self, z, context, mask=None):
        # checkpoint_name tags the conv inputs so the 'save_wn' remat policy
        # (flow_decoder.RADMMMFlow.remat) can keep exactly these activations
        # and skip recomputing the conv stack in the backward pass — the
        # convs are ~all the step's FLOPs but their inputs are few bytes
        from jax.ad_checkpoint import checkpoint_name
        act = jax.nn.softplus if self.affine_activation == "softplus" else jax.nn.relu
        h = jnp.concatenate([z, context], axis=-1)
        h = MaskedConv1d(self.n_channels, 1, use_weight_norm=True,
                         name="start")(h)
        h = checkpoint_name(h, "wn_h")
        output = jnp.zeros_like(h)
        for i in range(self.n_layers):
            dilation = 2 ** i if self.use_dilation else 1
            h = act(MaskedConv1d(
                self.n_channels, self.kernel_size, dilation=dilation,
                use_partial_padding=self.use_partial_padding,
                use_weight_norm=True, name=f"in_{i}")(h, mask))
            h = checkpoint_name(h, "wn_h")
            res_skip = act(MaskedConv1d(
                self.n_channels, 1, use_weight_norm=True,
                name=f"res_skip_{i}")(h))
            output = output + res_skip
        output = checkpoint_name(output, "wn_skip")
        return MaskedConv1d(2 * self.n_in_channels, 1, zero_init=True,
                            name="end")(output)


class SimpleConvNet(nn.Module):
    """Dilated conv stack with channel doubling (max 1024), relu, 1x1 head."""
    final_out_channels: int
    n_layers: int = 2
    kernel_size: int = 5
    with_dilation: bool = True
    max_channels: int = 1024
    zero_init: bool = True
    use_partial_padding: bool = True

    @nn.compact
    def __call__(self, z_w_context, mask=None):
        h = z_w_context
        for i in range(self.n_layers):
            dilation = 2 ** i if self.with_dilation else 1
            out_ch = min(self.max_channels, h.shape[-1] * 2)
            h = MaskedConv1d(out_ch, self.kernel_size, dilation=dilation,
                             w_init_gain="relu",
                             use_partial_padding=self.use_partial_padding,
                             name=f"layer_{i}")(h, mask)
            h = jax.nn.relu(h)
        return MaskedConv1d(self.final_out_channels, 1,
                            zero_init=self.zero_init, name="last")(h)


class FiLMResBlock(nn.Module):
    """FiLM-conditioned residual block (common.py:706-735)."""
    out_channels: int
    kernel_size: int = 1
    dilation: int = 1
    use_bn: bool = True
    use_partial_padding: bool = True
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, cond, mask=None, train=True, sync_bn=False):
        x1 = MaskedConv1d(self.out_channels, 1, use_weight_norm=True,
                          use_partial_padding=self.use_partial_padding,
                          name="input_conv")(x, mask)
        c1 = MaskedConv1d(2 * self.out_channels, 1, use_weight_norm=True,
                          use_partial_padding=self.use_partial_padding,
                          name="cond_conv")(cond, mask)
        scale = c1[..., :self.out_channels] + 1.0
        bias = c1[..., self.out_channels:]
        x1_res = jax.nn.leaky_relu(x1, 0.01)
        x2 = MaskedConv1d(self.out_channels, self.kernel_size,
                          dilation=self.dilation, use_weight_norm=True,
                          use_partial_padding=self.use_partial_padding,
                          name="hidden_conv")(x1_res, mask)
        if self.use_bn:
            x2 = MaskedBatchNorm(self.out_channels,
                                 axis_name=self.bn_axis_name,
                                 name="bn")(x2, mask, train=train,
                                            sync=sync_bn)
        x2 = jax.nn.leaky_relu(x2 * scale + bias, 0.01)
        return 0.5 * (x2 + x1_res)


class FiLMStack(nn.Module):
    """Stack of FiLMResBlocks with dilated kernels + zero-init 1x1 head."""
    n_hidden_channels: int
    n_out_channels: int
    n_layers: int
    kernel_size: int = 5
    use_dilation: bool = True
    use_bn: bool = True
    use_partial_padding: bool = True
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, context, mask=None, train=True, sync_bn=False):
        for i in range(self.n_layers):
            dilation = 2 ** i if self.use_dilation else 1
            x = FiLMResBlock(self.n_hidden_channels, self.kernel_size,
                             dilation, self.use_bn, self.use_partial_padding,
                             bn_axis_name=self.bn_axis_name,
                             name=f"block_{i}")(x, context, mask, train,
                                                sync_bn)
        return MaskedConv1d(self.n_out_channels, 1, zero_init=True,
                            name="end")(x)


def scaling_and_logs(u: jax.Array, scaling_fn: Union[str, Sequence[str]]):
    """Constrained scale + its log (common.py:1127-1161).

    'tanh' (the shipped config): s = tanh(u) + 1 + 1e-6.
    """
    def one(u, fn):
        if fn == "translate":
            return jnp.ones_like(u), jnp.zeros_like(u)
        if fn == "exp":
            return jnp.exp(u), u
        if fn == "tanh":
            s = jnp.tanh(u) + 1.0 + 1e-6
            return s, jnp.log(s)
        if fn == "sigmoid":
            s = jax.nn.sigmoid(u + 10.0) + 1e-6
            return s, jnp.log(s)
        raise ValueError(f"unsupported scaling fn {fn}")

    if isinstance(scaling_fn, str):
        return one(u, scaling_fn)
    outs = [one(u[..., i:i + 1], fn) for i, fn in enumerate(scaling_fn)]
    return (jnp.concatenate([s for s, _ in outs], axis=-1),
            jnp.concatenate([l for _, l in outs], axis=-1))


class AffineCoupling(nn.Module):
    """Split-half affine coupling: z1 <- s(z0, ctx) * z1 + b(z0, ctx)."""
    n_mel_channels: int
    n_layers: int
    affine_model: str = "wavenet"
    scaling_fn: Union[str, Sequence[str]] = "exp"
    affine_activation: str = "softplus"
    with_dilation: bool = True
    kernel_size: int = 5
    n_channels: int = 1024
    use_partial_padding: bool = False

    @nn.compact
    def __call__(self, z, context, mask=None, inverse=False, train=True,
                 sync_bn=False):
        n_half = self.n_mel_channels // 2
        z0, z1 = z[..., :n_half], z[..., n_half:]
        if self.affine_model == "wavenet":
            params = WN(n_half, self.n_layers, self.n_channels,
                        self.kernel_size, self.affine_activation,
                        self.use_partial_padding, name="wn")(z0, context, mask)
        elif self.affine_model == "simple_conv":
            params = SimpleConvNet(
                self.n_mel_channels, self.n_layers, self.kernel_size,
                self.with_dilation, zero_init=True,
                use_partial_padding=self.use_partial_padding,
                name="scn")(jnp.concatenate([z0, context], axis=-1), mask)
        elif self.affine_model == "film_stack":
            params = FiLMStack(1024, self.n_mel_channels, self.n_layers,
                               self.kernel_size, self.with_dilation,
                               use_bn=False, name="film")(
                                   z0, context, mask, train, sync_bn)
        else:
            raise ValueError(f"unknown affine model {self.affine_model}")

        s, log_s = scaling_and_logs(params[..., :n_half], self.scaling_fn)
        b = params[..., n_half:]
        if inverse:
            z1 = (z1 - b) / s
            return jnp.concatenate([z0, z1], axis=-1)
        z1 = s * z1 + b
        return jnp.concatenate([z0, z1], axis=-1), log_s


class SplineCoupling(nn.Module):
    """Split-half monotone-spline coupling over [left,right]->[bottom,top].

    Default config (decoders.py:51-61): quadratic, 32 bins, bounds ±3,
    FiLM param predictor with 512 hidden channels.
    """
    n_mel_channels: int
    n_layers: int
    n_bins: int = 8
    left: float = -4.0
    right: float = 4.0
    bottom: float = -4.0
    top: float = 4.0
    use_quadratic: bool = False
    use_bn: bool = True
    kernel_size: int = 5
    with_dilation: bool = True
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, z, context, mask=None, inverse=False, train=True,
                 sync_bn=False):
        n_half = self.n_mel_channels // 2
        n_bins = 2 * self.n_bins + 1 if self.use_quadratic else self.n_bins
        z0, z1 = z[..., :n_half], z[..., n_half:]

        if inverse:
            z1 = (z1 - self.bottom) / (self.top - self.bottom)
        else:
            z1 = (z1 - self.left) / (self.right - self.left)

        params = FiLMStack(512, n_half * n_bins, self.n_layers,
                           self.kernel_size, self.with_dilation, self.use_bn,
                           bn_axis_name=self.bn_axis_name, name="film")(
                               z0, context, mask, train, sync_bn)
        B, T = z1.shape[0], z1.shape[1]
        q_tilde = params.reshape(B * T, n_half, n_bins)
        z1_flat = z1.reshape(B * T, n_half).astype(jnp.float32)

        if self.use_quadratic:
            w_t = q_tilde[..., :n_bins // 2]
            v_t = q_tilde[..., n_bins // 2:]
            z1_t, log_s = S.unbounded_piecewise_quadratic_transform(
                z1_flat, w_t, v_t, inverse=inverse)
            if not inverse:
                log_s = jnp.sum(log_s, axis=1)
        else:
            if inverse:
                z1_t, _ = S.piecewise_linear_inverse_transform(z1_flat, q_tilde)
            else:
                z1_t, log_s = S.piecewise_linear_transform(z1_flat, q_tilde)

        z1 = z1_t.reshape(B, T, n_half)
        if inverse:
            z1 = z1 * (self.right - self.left) + self.left
            return jnp.concatenate([z0, z1], axis=-1)
        z1 = z1 * (self.top - self.bottom) + self.bottom
        log_s = log_s.reshape(B, T, 1) + n_half * (
            np.log(self.top - self.bottom) - np.log(self.right - self.left))
        return jnp.concatenate([z0, z1], axis=-1), log_s


class SplineCouplingAR(nn.Module):
    """Autoregressive spline transform: params from context only
    (SplineTransformationLayerAR, common.py:925-1003)."""
    n_in_channels: int
    n_layers: int
    n_bins: int = 8
    left: float = -6.0
    right: float = 6.0
    bottom: float = -6.0
    top: float = 6.0
    use_quadratic: bool = False

    @nn.compact
    def __call__(self, z, context, inverse=False):
        n_bins = 2 * self.n_bins + 1 if self.use_quadratic else self.n_bins
        if inverse:
            zn = (z - self.bottom) / (self.top - self.bottom)
        else:
            zn = (z - self.left) / (self.right - self.left)

        params = SimpleConvNet(self.n_in_channels * n_bins, self.n_layers,
                               kernel_size=1, with_dilation=False,
                               zero_init=True, use_partial_padding=False,
                               name="scn")(context)
        B, T, C = z.shape
        q_tilde = params.reshape(B * T, C, n_bins)
        z_flat = zn.reshape(B * T, C).astype(jnp.float32)

        if self.use_quadratic:
            w_t = q_tilde[..., :n_bins // 2]
            v_t = q_tilde[..., n_bins // 2:]
            z_t, log_s = S.unbounded_piecewise_quadratic_transform(
                z_flat, w_t, v_t, inverse=inverse)
        else:
            if inverse:
                z_t, log_s = S.piecewise_linear_inverse_transform(
                    z_flat, q_tilde)
            else:
                z_t, log_s = S.piecewise_linear_transform(z_flat, q_tilde)

        out = z_t.reshape(B, T, C)
        if inverse:
            out = out * (self.right - self.left) + self.left
            return out
        out = out * (self.top - self.bottom) + self.bottom
        log_s = (log_s.reshape(B, T, -1)
                 if log_s.ndim > 1 else log_s.reshape(B, T, 1))
        log_s = log_s + C * (np.log(self.top - self.bottom)
                             - np.log(self.right - self.left))
        return out, log_s
