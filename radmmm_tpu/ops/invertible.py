"""Invertible 1x1 "convolutions" (per-frame channel mixes) for the flow.

Three variants, matching the reference's semantics (common.py:507-662):

* InvertibleLU     — LU-parameterized W = P·L·U with logdet = Σ log|diag U|
                     (Invertible1x1ConvLUS).
* WhiteningConv    — data-initialized PCA-whitening W = U (upper triangular
                     Cholesky factor of the inverse covariance), mean
                     subtraction, trainable after init
                     (DataInitializedInvertible1x1Conv). The init pass is an
                     explicit jitted function with a psum over the data axis
                     — the TPU-native replacement for the reference's
                     dist.broadcast from rank 0 (common.py:584-586): every
                     replica computes the identical global covariance, so no
                     broadcast is needed.
* InvertibleConv   — plain dense W with logdet = slogdet(W)
                     (Invertible1x1Conv).

Channels-last: x is (B, T, C); y[t] = W @ x[t] is computed as x @ W.T — one
MXU matmul over all frames. Inference uses jnp.linalg.inv (tiny CxC solve);
callers may cache the inverses (the reference's cache_inverse idiom).

Init note: the LU factors must be mutually consistent (one orthonormal W),
but flax folds a distinct RNG into every param — so the factorization is
computed once on the host from an explicit `init_seed` (numpy/scipy), like
the reference's torch.qr+torch.lu at construction (common.py:510-515).
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import scipy.linalg
from flax import linen as nn

_MM = dict(precision=jax.lax.Precision.HIGHEST)


@functools.lru_cache(maxsize=None)
def _lu_factors_host(seed: int, c: int):
    """Random orthonormal (det=+1) W and its P,L,U factors, host-side."""
    rng = np.random.default_rng(seed)
    w = rng.standard_normal((c, c)).astype(np.float64)
    q, _ = np.linalg.qr(w)
    if np.linalg.det(q) < 0:
        q[:, 0] = -q[:, 0]
    p, l, u = scipy.linalg.lu(q)  # q == p @ l @ u
    return (p.astype(np.float32), np.tril(l, -1).astype(np.float32),
            np.triu(u, 1).astype(np.float32),
            np.diagonal(u).astype(np.float32).copy())


class InvertibleLU(nn.Module):
    """W = P·L·U; P fixed buffer, L (unit-diag) / U trainable."""
    channels: int
    init_seed: int = 0

    def setup(self):
        c = self.channels
        p, lower, upper, upper_diag = _lu_factors_host(self.init_seed, c)
        self.p = self.variable("buffers", "p", lambda: jnp.asarray(p))
        self.lower = self.param("lower", lambda k, s: jnp.asarray(lower), (c, c))
        self.upper = self.param("upper", lambda k, s: jnp.asarray(upper), (c, c))
        self.upper_diag = self.param(
            "upper_diag", lambda k, s: jnp.asarray(upper_diag), (c,))

    def weight(self) -> jax.Array:
        c = self.channels
        L = jnp.tril(self.lower, -1) + jnp.eye(c)
        U = jnp.triu(self.upper, 1) + jnp.diag(self.upper_diag)
        return self.p.value @ (L @ U)

    def __call__(self, z: jax.Array, inverse: bool = False):
        W = self.weight()
        if inverse:
            W_inv = jnp.linalg.inv(W.astype(jnp.float32))
            return jnp.einsum("btc,dc->btd", z, W_inv, **_MM)
        y = jnp.einsum("btc,dc->btd", z, W, **_MM)
        log_det_W = jnp.sum(jnp.log(jnp.abs(self.upper_diag)))
        return y, log_det_W


class WhiteningConv(nn.Module):
    """Data-initialized whitening 1x1: y = U (x - mean).

    Starts from a random LU-style init; `whitening_stats` +
    `whitening_params_from_stats` overwrite (upper, upper_diag, input_mean)
    from the first batch's masked covariance (common.py:569-591).
    """
    channels: int
    init_seed: int = 0

    def setup(self):
        c = self.channels
        _, _, upper, upper_diag = _lu_factors_host(self.init_seed + 7919, c)
        self.upper = self.param("upper", lambda k, s: jnp.asarray(upper), (c, c))
        self.upper_diag = self.param(
            "upper_diag", lambda k, s: jnp.asarray(upper_diag), (c,))
        self.input_mean = self.variable(
            "buffers", "input_mean", lambda: jnp.zeros((c,)))
        self.initialized = self.variable(
            "buffers", "initialized", lambda: jnp.zeros((), jnp.bool_))

    def weight(self) -> jax.Array:
        return jnp.triu(self.upper, 1) + jnp.diag(self.upper_diag)

    def __call__(self, z: jax.Array, inverse: bool = False):
        W = self.weight()
        if inverse:
            W_inv = jnp.linalg.inv(W.astype(jnp.float32))
            return (jnp.einsum("btc,dc->btd", z, W_inv, **_MM)
                    + self.input_mean.value)
        y = jnp.einsum("btc,dc->btd", z - self.input_mean.value, W, **_MM)
        log_det_W = jnp.sum(jnp.log(jnp.abs(self.upper_diag)))
        return y, log_det_W


def whitening_stats(data: jax.Array, mask: jax.Array,
                    axis_name: Optional[str] = None):
    """Masked mean/covariance over valid frames; psum across the data axis.

    data: (B, T, C), mask: (B, T). Returns (mean (C,), covar (C, C)).
    Identical on every replica by construction — the SPMD replacement for
    rank-0 compute + broadcast (common.py:569-586).
    """
    m = mask.astype(data.dtype)
    n = m.sum()
    s1 = jnp.einsum("btc,bt->c", data, m)
    if axis_name is not None:
        n = jax.lax.psum(n, axis_name)
        s1 = jax.lax.psum(s1, axis_name)
    mean = s1 / n
    # two-pass centered second moment: the E[x²]-E[x]² form cancels
    # catastrophically in f32 for mel features sitting at the log floor
    centered = (data - mean) * m[..., None]
    s2 = jnp.einsum("btc,btd->cd", centered, centered, **_MM)
    if axis_name is not None:
        s2 = jax.lax.psum(s2, axis_name)
    covar = s2 / n
    return mean, covar


def whitening_params_from_stats(mean: jax.Array, covar: jax.Array,
                                ridge: float = 1e-5):
    """upper-Cholesky of covar^-1: W s.t. cov(W(x-mean)) = I.

    A small trace-scaled ridge keeps the inverse finite when the init batch
    has fewer valid frames than channels (the reference assumes a large
    first batch and would NaN here, common.py:581-583).
    """
    c = covar.shape[0]
    covar = covar + (ridge * jnp.trace(covar) / c) * jnp.eye(c)
    inv_covar = jnp.linalg.inv(covar.astype(jnp.float32))
    # upper Cholesky U with A = Uᵀ U  ==  (lower cholesky of A)ᵀ
    chol_l = jnp.linalg.cholesky(inv_covar)
    W = chol_l.T
    return {"upper": jnp.triu(W, 1), "upper_diag": jnp.diagonal(W),
            "input_mean": mean}


class InvertibleConv(nn.Module):
    """Plain dense invertible 1x1 (Invertible1x1Conv, common.py:621-662)."""
    channels: int
    init_seed: int = 0

    @nn.compact
    def __call__(self, z: jax.Array, inverse: bool = False):
        def init_w(key, shape):
            p, l, u, d = _lu_factors_host(self.init_seed + 104729,
                                          self.channels)
            return jnp.asarray(p @ (l + np.eye(self.channels)) @
                               (u + np.diag(d)))
        W = self.param("weight", init_w, (self.channels, self.channels))
        if inverse:
            W_inv = jnp.linalg.inv(W.astype(jnp.float32))
            return jnp.einsum("btc,dc->btd", z, W_inv, **_MM)
        y = jnp.einsum("btc,dc->btd", z, W, **_MM)
        _, log_det_W = jnp.linalg.slogdet(W)
        return y, log_det_W
