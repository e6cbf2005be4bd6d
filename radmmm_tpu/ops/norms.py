"""Masked normalization layers: instance norm and batch norm with length masks.

* MaskedInstanceNorm1d — per-sample/channel stats over *valid* frames only.
  Equivalent to the reference applying torch InstanceNorm1d to each sequence
  truncated to its true length (Encoder conv loop, common.py:437-476).
* MaskedBatchNorm — batch stats over masked entries with running-stat
  tracking and optional cross-replica psum sync, matching
  maskedbatchnorm1d.py:30-118 (sync == distnn.all_reduce of (Σx, Σx², n)).

Layout: (B, T, C); masks are (B, T).
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn


class MaskedInstanceNorm1d(nn.Module):
    """Affine instance norm over valid frames. eps matches torch (1e-5)."""
    features: int
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x: jax.Array, mask: Optional[jax.Array] = None) -> jax.Array:
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        if mask is None:
            m = jnp.ones(x.shape[:2], x.dtype)
        else:
            m = mask.astype(x.dtype)
        n = jnp.maximum(m.sum(axis=1), 1.0)[:, None]          # (B, 1)
        xm = x * m[..., None]
        mean = xm.sum(axis=1) / n                             # (B, C)
        var = (xm * x).sum(axis=1) / n - mean ** 2            # biased, (B, C)
        out = (x - mean[:, None, :]) * jax.lax.rsqrt(var[:, None, :] + self.eps)
        out = out * scale[None, None, :] + bias[None, None, :]
        if mask is not None:
            out = out * m[..., None]
        return out


class MaskedBatchNorm(nn.Module):
    """Length-masked BatchNorm1d with running stats and optional psum sync.

    Train: normalize with masked *batch* stats (biased var); update
    running_mean with batch mean and running_var with the unbiased var
    (var * n/(n-1)), momentum semantics identical to torch
    (maskedbatchnorm1d.py:73-107). Eval: use running stats.

    `axis_name`: collective axis for distributed sync (the TPU-native
    equivalent of distnn.all_reduce over DDP ranks).
    """
    features: int
    momentum: float = 0.1
    eps: float = 1e-5
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x: jax.Array, mask: Optional[jax.Array] = None,
                 train: bool = True, sync: bool = False) -> jax.Array:
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((self.features,)))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((self.features,)))

        if mask is None:
            m = jnp.ones(x.shape[:2], x.dtype)
        else:
            m = mask.astype(x.dtype)

        if train:
            n = m.sum()
            sum_x = jnp.einsum("btc,bt->c", x, m)
            sum_xsq = jnp.einsum("btc,bt->c", x * x, m)
            if sync and self.axis_name is not None:
                sum_x = jax.lax.psum(sum_x, self.axis_name)
                sum_xsq = jax.lax.psum(sum_xsq, self.axis_name)
                n = jax.lax.psum(n, self.axis_name)
            mean = sum_x / n
            var = sum_xsq / n - mean ** 2
            if not self.is_initializing():
                ra_mean.value = (self.momentum * mean
                                 + (1 - self.momentum) * ra_mean.value)
                unbiased = var * n / jnp.maximum(n - 1.0, 1.0)
                ra_var.value = (self.momentum * unbiased
                                + (1 - self.momentum) * ra_var.value)
        else:
            mean, var = ra_mean.value, ra_var.value

        out = (x - mean[None, None, :]) * jax.lax.rsqrt(var[None, None, :] + self.eps)
        return out * scale[None, None, :] + bias[None, None, :]
