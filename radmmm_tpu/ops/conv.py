"""Masked 1-D convolutions, channels-last, with weight-norm and partial padding.

Replaces the reference's ConvNorm / PartialConv1d stack (common.py:152-191,
partialconv1d.py:43-94). Two key behavioral points reproduced exactly:

* Masked conv == the reference's per-item "conv the truncated sequence" loop
  (common.py:468-476, 281-290): convolving a zero-masked padded sequence with
  zero ('SAME') padding is mathematically identical to convolving each item
  truncated to its length, so we batch it — no per-item Python loop.
* Partial padding renormalizes outputs near mask/padding boundaries by
  slide_winsize / (#valid taps), and re-zeroes masked positions.

Layout is (B, T, C); kernels are (K, C_in, C_out) (lax conv_general NWC/WIO).
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


# Global conv compute precision. HIGHEST = full f32 (6-pass on the MXU),
# the reference's fp32 training regime. 'bf16' (Precision.DEFAULT) runs the
# MXU at native bf16 throughput — the production inference setting
# (set via set_conv_precision or env RADMMM_CONV_PRECISION=bf16).
import os as _os

_PRECISION = (jax.lax.Precision.DEFAULT
              if _os.environ.get("RADMMM_CONV_PRECISION") == "bf16"
              else jax.lax.Precision.HIGHEST)


def set_conv_precision(precision: str) -> None:
    """'bf16' | 'f32' — applies to subsequently traced convolutions."""
    global _PRECISION
    _PRECISION = (jax.lax.Precision.DEFAULT if precision == "bf16"
                  else jax.lax.Precision.HIGHEST)


def get_conv_precision():
    return _PRECISION


def xavier_uniform_gain(gain: float):
    """torch.nn.init.xavier_uniform_ with explicit gain, for (K, Cin, Cout)."""
    def init(key, shape, dtype=jnp.float32):
        k, cin, cout = shape
        fan_in, fan_out = cin * k, cout * k
        bound = gain * np.sqrt(6.0 / (fan_in + fan_out))
        return jax.random.uniform(key, shape, dtype, -bound, bound)
    return init


def calculate_gain(nonlinearity: str) -> float:
    return {"linear": 1.0, "relu": float(np.sqrt(2.0)), "tanh": 5.0 / 3}[nonlinearity]


def conv1d_same(x: jax.Array, kernel: jax.Array, dilation: int = 1,
                padding: Optional[int] = None) -> jax.Array:
    """(B, T, Cin) x (K, Cin, Cout) -> (B, T', Cout), zero padding.

    bf16 mode casts BOTH operands to bf16 before the conv (f32 params stay
    the master copy; accumulation stays f32 via preferred_element_type).
    An explicit cast — not just Precision.DEFAULT — halves the HBM bytes
    of weight reads and of the activations XLA saves for the backward
    pass, which is where the HBM-bound train step's bytes live
    (the dominant cost: WN conv stacks, decoders.py:184-196).
    """
    k = kernel.shape[0]
    if padding is None:
        padding = dilation * (k - 1) // 2
    bf16 = (_PRECISION is jax.lax.Precision.DEFAULT
            and _os.environ.get("RADMMM_BF16_CAST", "1") != "0")
    if bf16:
        # bf16 in/out: the MXU accumulates in f32 internally either way,
        # and a bf16 output dtype keeps the backward pass pure-bf16 (a f32
        # preferred_element_type would make the conv-transpose VJP
        # mixed-dtype). The f32 upcast below fuses into whatever consumes
        # the conv.
        x = x.astype(jnp.bfloat16)
        kernel = kernel.astype(jnp.bfloat16)
    out = jax.lax.conv_general_dilated(
        x, kernel,
        window_strides=(1,),
        padding=[(padding, padding)],
        rhs_dilation=(dilation,),
        dimension_numbers=("NWC", "WIO", "NWC"),
        precision=_PRECISION,
        preferred_element_type=jnp.bfloat16 if bf16 else jnp.float32,
    )
    return out.astype(jnp.float32) if bf16 else out


class MaskedConv1d(nn.Module):
    """ConvNorm equivalent: optional weight norm, partial padding, mask re-zero.

    Mirrors common.py:152-191. `mask` is (B, T) (float or bool) or None.
    """
    features: int
    kernel_size: int = 1
    dilation: int = 1
    use_bias: bool = True
    use_partial_padding: bool = False
    use_weight_norm: bool = False
    w_init_gain: str = "linear"
    padding: Optional[int] = None
    zero_init: bool = False
    # zero the input at masked positions before convolving. The reference's
    # non-partial ConvNorm does NOT (common.py:180-190): with kernel_size>1
    # the last valid frame reads the (nonzero) padded frame beyond it. True
    # everywhere pre-masking is equivalent (partial padding / zero-padded
    # inputs / the reference's per-item slicing); the DAP bottleneck sets
    # False for exact behavior parity (attribute_predictors.py:46-51).
    premask_input: bool = True

    @nn.compact
    def __call__(self, x: jax.Array, mask: Optional[jax.Array] = None) -> jax.Array:
        cin = x.shape[-1]
        shape = (self.kernel_size, cin, self.features)
        if self.zero_init:
            w_init = nn.initializers.zeros
        else:
            w_init = xavier_uniform_gain(calculate_gain(self.w_init_gain))
        if self.use_weight_norm:
            # torch weight_norm(dim=0): per-output-channel g over (Cin, K)
            v = self.param("v", w_init, shape)
            g = self.param(
                "g", lambda _, s: jnp.linalg.norm(
                    v.transpose(2, 0, 1).reshape(self.features, -1), axis=1),
                (self.features,))
            norm = jnp.linalg.norm(
                v.transpose(2, 0, 1).reshape(self.features, -1), axis=1)
            kernel = v * (g / jnp.maximum(norm, 1e-12))[None, None, :]
        else:
            kernel = self.param("kernel", w_init, shape)
        bias = (self.param("bias", nn.initializers.zeros, (self.features,))
                if self.use_bias else None)

        fmask = None
        if mask is not None:
            fmask = mask.astype(x.dtype)[..., None]  # (B, T, 1)
            if self.premask_input or self.use_partial_padding:
                x = x * fmask

        raw = conv1d_same(x, kernel, self.dilation, self.padding)

        if self.use_partial_padding:
            # slide_winsize / conv(mask) renormalization (partialconv1d.py:74-89)
            ones_kernel = jnp.ones((self.kernel_size, 1, 1), x.dtype)
            m = (fmask if fmask is not None
                 else jnp.ones((1, x.shape[1], 1), x.dtype))
            update_mask = conv1d_same(m, ones_kernel, self.dilation, self.padding)
            mask_ratio = self.kernel_size / (update_mask + 1e-6)
            update_mask = jnp.clip(update_mask, 0.0, 1.0)
            mask_ratio = mask_ratio * update_mask
            if bias is not None:
                out = (raw) * mask_ratio + bias[None, None, :] * update_mask
            else:
                out = raw * mask_ratio
        else:
            out = raw if bias is None else raw + bias[None, None, :]

        if fmask is not None:
            # "always re-zero output if mask is available" (common.py:186-190)
            out = out * fmask
        return out


class DenseLayer(nn.Module):
    """Stack of tanh-activated linears (common.py:194-205)."""
    sizes: tuple = (1024, 1024)

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        for i, size in enumerate(self.sizes):
            x = jnp.tanh(Linear(size, name=f"linear_{i}")(x))
        return x


class Linear(nn.Module):
    """LinearNorm equivalent (common.py:139-149): xavier-uniform init."""
    features: int
    use_bias: bool = True
    w_init_gain: str = "linear"

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        cin = x.shape[-1]
        gain = calculate_gain(self.w_init_gain)
        bound = gain * np.sqrt(6.0 / (cin + self.features))
        kernel = self.param(
            "kernel",
            lambda key, s: jax.random.uniform(key, s, jnp.float32, -bound, bound),
            (cin, self.features))
        out = x @ kernel
        if self.use_bias:
            # torch Linear default bias init: U(-1/sqrt(fan_in), 1/sqrt(fan_in))
            b_bound = 1.0 / np.sqrt(cin)
            bias = self.param(
                "bias",
                lambda key, s: jax.random.uniform(key, s, jnp.float32,
                                                  -b_bound, b_bound),
                (self.features,))
            out = out + bias
        return out
