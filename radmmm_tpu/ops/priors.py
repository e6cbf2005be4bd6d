"""Beta-binomial text/mel alignment prior, computed closed-form on device.

Reference computes this per item on CPU with scipy.stats.betabinom and caches /
bilinearly interpolates (data.py:61-101). Here the log-pmf is closed form with
betaln so an entire padded batch of priors is one vectorized XLA computation:

    P(k; n, a, b) = C(n, k) B(k+a, n-k+b) / B(a, b)
    with a = scale * i, b = scale * (M + 1 - i) for mel frame i in 1..M.

Padded (invalid) rows/cols get zeros, matching the zero-padded collated prior
(data.py:678-741).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.scipy.special import betaln, gammaln


def _log_comb(n, k):
    return gammaln(n + 1) - gammaln(k + 1) - gammaln(n - k + 1)


def beta_binomial_log_pmf(k, n, a, b):
    return _log_comb(n, k) + betaln(k + a, n - k + b) - betaln(a, b)


@functools.partial(jax.jit, static_argnames=("max_text", "max_mel"))
def beta_binomial_prior(text_len: jax.Array, mel_len: jax.Array,
                        max_text: int, max_mel: int,
                        scaling_factor: float = 0.05) -> jax.Array:
    """Batched prior matrices, shape (B, max_mel, max_text).

    Row i (1-indexed over valid mel frames) is BetaBinom(P-1, s*i, s*(M+1-i)).pmf
    over k in [0, P), exactly the reference's beta_binomial_prior_distribution
    (data.py:90-101) without the interpolation approximation.
    """
    text_len = jnp.asarray(text_len)
    mel_len = jnp.asarray(mel_len)
    squeeze = text_len.ndim == 0
    text_len = jnp.atleast_1d(text_len).astype(jnp.float32)
    mel_len = jnp.atleast_1d(mel_len).astype(jnp.float32)

    k = jnp.arange(max_text, dtype=jnp.float32)[None, None, :]     # text axis
    i = jnp.arange(1, max_mel + 1, dtype=jnp.float32)[None, :, None]  # mel axis
    P = text_len[:, None, None]
    M = mel_len[:, None, None]

    a = scaling_factor * i
    b = scaling_factor * (M + 1.0 - i)
    # clamp b > 0 on padded rows (i > M) to keep betaln finite; masked out below
    b = jnp.maximum(b, scaling_factor)
    n = jnp.maximum(P - 1.0, 0.0)
    k_valid = jnp.minimum(k, n)

    logp = beta_binomial_log_pmf(k_valid, n, a, b)
    prior = jnp.exp(logp)

    mel_mask = i <= M
    text_mask = k < P
    prior = jnp.where(mel_mask & text_mask, prior, 0.0)
    if squeeze:
        prior = prior[0]
    return prior
