"""Piecewise-linear and piecewise-quadratic monotone spline transforms.

Pure JAX functions with static shapes (no boolean gathering — XLA-friendly
`where` selection instead of the reference's dynamic-shape advanced indexing,
splines.py:57-339). Math follows the piecewise-linear / piecewise-quadratic
coupling transforms of Müller et al. (Neural Importance Sampling), as used by
the reference's spline coupling layers.

Shapes: x is (N, K); q_tilde is (N, K, B) bin logits. All math in float32
(the reference forces fp32 under AMP, common.py:984, 1060).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = jnp.finfo(jnp.float32).eps


def piecewise_linear_transform(x, q_tilde, outlier_passthru=True):
    """Forward CDF transform through a piecewise-constant pdf.

    Returns (y, logj) with logj summed over the K dim, matching
    splines.py:57-142.
    """
    n_bins = q_tilde.shape[-1]
    w = 1.0 / n_bins
    q = jax.nn.softmax(q_tilde, axis=-1) / w  # normalized heights (N,K,B)

    x_safe = jnp.clip(x, 0.0, 1.0)
    mx = jnp.clip(jnp.floor(n_bins * x_safe), 0, n_bins - 1).astype(jnp.int32)

    slopes = jnp.take_along_axis(q, mx[..., None], axis=-1)[..., 0]
    alpha = x_safe - mx.astype(x.dtype) * w
    out = alpha * slopes

    # integral strictly left of each bin
    q_left = jnp.cumsum(q, axis=-1) * w
    q_left = jnp.concatenate(
        [jnp.zeros_like(q_left[..., :1]), q_left[..., :-1]], axis=-1)
    out = out + jnp.take_along_axis(q_left, mx[..., None], axis=-1)[..., 0]
    out = jnp.clip(out, _EPS, 1.0 - _EPS)

    oob = ((x < 0.0) | (x > 1.0)).astype(x.dtype)
    oob = jax.lax.stop_gradient(oob)
    if outlier_passthru:
        out = out * (1 - oob) + x * oob
        slopes = slopes * (1 - oob) + oob
    logj = jnp.sum(jnp.log(slopes), axis=1)
    return out, logj


def piecewise_linear_inverse_transform(y, q_tilde, outlier_passthru=True):
    """Inverse of piecewise_linear_transform (splines.py:145-238)."""
    n_bins = q_tilde.shape[-1]
    w = 1.0 / n_bins
    q = jax.nn.softmax(q_tilde, axis=-1) / w

    q_left = jnp.cumsum(q, axis=-1) * w
    q_left = jnp.concatenate(
        [jnp.zeros_like(q_left[..., :1]), q_left[..., :-1]], axis=-1)

    y_safe = jnp.clip(y, 0.0, 1.0)
    # bin = largest index with q_left <= y  (the reference's argmin-over-
    # positive-differences construction, splines.py:198-204)
    edges = jnp.sum((q_left <= y_safe[..., None]).astype(jnp.int32),
                    axis=-1) - 1
    edges = jnp.clip(edges, 0, n_bins - 1)

    ql_b = jnp.take_along_axis(q_left, edges[..., None], axis=-1)[..., 0]
    q_b = jnp.take_along_axis(q, edges[..., None], axis=-1)[..., 0]
    x = (y_safe - ql_b) / jnp.maximum(q_b, _EPS) + edges.astype(y.dtype) * w
    x = jnp.clip(x, _EPS, 1.0 - _EPS)

    oob = ((y < 0.0) | (y > 1.0)).astype(y.dtype)
    oob = jax.lax.stop_gradient(oob)
    if outlier_passthru:
        x = x * (1 - oob) + y * oob
        q_b = q_b * (1 - oob) + oob
    logj = -jnp.sum(jnp.log(q_b), axis=1)
    return jax.lax.stop_gradient(x), logj


def _weighted_softmax(v, w):
    """Vertex heights normalized so the quadratic CDF integrates to 1
    (splines.py:267-272)."""
    v = v - jnp.max(v, axis=-1, keepdims=True)
    v = jnp.exp(v) + 1e-8
    v_sum = jnp.sum((v[..., :-1] + v[..., 1:]) / 2 * w, axis=-1, keepdims=True)
    return v / v_sum


def piecewise_quadratic_transform(x, w_tilde, v_tilde, inverse=False):
    """Monotone quadratic spline on [0,1): K bin widths, K+1 vertex heights.

    Forward returns (y, log_j elementwise); inverse returns (x, None)
    (splines.py:274-339).
    """
    w = jax.nn.softmax(w_tilde, axis=-1)
    v = _weighted_softmax(v_tilde, w)
    w_cumsum = jnp.cumsum(w, axis=-1)
    w_cumsum = w_cumsum.at[..., -1].set(1.0)
    w_cumsum_shift = jnp.concatenate(
        [jnp.zeros_like(w_cumsum[..., :1]), w_cumsum[..., :-1]], axis=-1)
    cdf = jnp.cumsum((v[..., 1:] + v[..., :-1]) / 2 * w, axis=-1)
    cdf = cdf.at[..., -1].set(1.0)
    cdf_shift = jnp.concatenate(
        [jnp.zeros_like(cdf[..., :1]), cdf[..., :-1]], axis=-1)

    table = cdf if inverse else w_cumsum
    # torch.searchsorted(table, x): first idx with table[idx] >= x
    bin_index = jnp.sum((table < x[..., None]).astype(jnp.int32), axis=-1)
    bin_index = jnp.clip(bin_index, 0, w.shape[-1] - 1)

    take = lambda a, i: jnp.take_along_axis(a, i[..., None], axis=-1)[..., 0]
    w_b = take(w, bin_index)
    w_bn1 = take(w_cumsum_shift, bin_index)
    v_b = take(v, bin_index)
    v_bp1 = take(v, bin_index + 1)
    cdf_bn1 = take(cdf_shift, bin_index)

    if not inverse:
        alpha = (x - w_bn1) / jnp.maximum(w_b, _EPS)
        c = ((alpha ** 2) / 2 * (v_bp1 - v_b) * w_b
             + alpha * v_b * w_b + cdf_bn1)
        log_j = jnp.log(jnp.maximum(v_b + alpha * (v_bp1 - v_b), _EPS))
        c = jnp.clip(c, _EPS, 1.0 - _EPS)
        return c, log_j
    else:
        # larger root of a·α² + b·α + c = 0 (a,b > 0 ⇒ axis < 0)
        a = (v_bp1 - v_b) * w_b / 2
        b = v_b * w_b
        c = cdf_bn1 - x
        disc = jnp.maximum(b ** 2 - 4 * a * c, 0.0)
        # guard a≈0 (linear segment): α = -c/b
        quad = (-b + jnp.sqrt(disc)) / jnp.where(
            jnp.abs(a) < 1e-12, 1.0, 2 * a)
        lin = -c / jnp.maximum(b, _EPS)
        alpha = jnp.where(jnp.abs(a) < 1e-12, lin, quad)
        inv = alpha * w_b + w_bn1
        inv = jnp.clip(inv, _EPS, 1.0 - _EPS)
        return inv, None


def unbounded_piecewise_quadratic_transform(x, w_tilde, v_tilde, upper=1.0,
                                            lower=0.0, inverse=False):
    """Identity outside [lower, upper), quadratic spline inside
    (splines.py:241-265). Static-shape: compute everywhere, select."""
    rng = upper - lower
    inside = (x >= lower) & (x < upper)
    x_norm = jnp.clip((x - lower) / rng, 0.0, 1.0 - _EPS)
    y_in, log_j_in = piecewise_quadratic_transform(
        x_norm, w_tilde, v_tilde, inverse=inverse)
    out = jnp.where(inside, y_in * rng + lower, x)
    if inverse:
        return out, None
    log_j = jnp.where(inside, log_j_in, 0.0)
    return out, log_j
