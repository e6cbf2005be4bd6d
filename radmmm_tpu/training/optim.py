"""Optimizers: exact-parity RAdam + AdamW, with global-norm clipping.

The reference insists on the original Liu et al. RAdam implementation rather
than torch's built-in ("do not use pytorch built-in version",
tts_lightning_modules.py:557; radam.py:45-142). optax.radam differs in its
below-threshold branch, so the exact update is implemented here as an optax
GradientTransformation:

* variance-rectified step when the SMA length N_sma >= 5,
* plain momentum SGD step (no second-moment denominator) otherwise,
* weight decay applied multiplicatively to params before the update
  (p -= wd * lr * p), matching radam.py:128-131.
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax


class RAdamState(NamedTuple):
    count: jax.Array
    exp_avg: optax.Updates
    exp_avg_sq: optax.Updates


def radam_exact(learning_rate: float, b1: float = 0.9, b2: float = 0.999,
                eps: float = 1e-8,
                weight_decay: float = 0.0) -> optax.GradientTransformation:
    def init_fn(params):
        zeros = jax.tree_util.tree_map(jnp.zeros_like, params)
        return RAdamState(count=jnp.zeros((), jnp.int32), exp_avg=zeros,
                          exp_avg_sq=jax.tree_util.tree_map(
                              jnp.zeros_like, params))

    def update_fn(updates, state, params=None):
        count = state.count + 1
        t = count.astype(jnp.float32)
        exp_avg = jax.tree_util.tree_map(
            lambda m, g: b1 * m + (1 - b1) * g, state.exp_avg, updates)
        exp_avg_sq = jax.tree_util.tree_map(
            lambda v, g: b2 * v + (1 - b2) * (g * g),
            state.exp_avg_sq, updates)

        beta2_t = b2 ** t
        n_sma_max = 2.0 / (1 - b2) - 1.0
        n_sma = n_sma_max - 2.0 * t * beta2_t / (1 - beta2_t)
        bias1 = 1 - b1 ** t

        rect = jnp.sqrt((1 - beta2_t) * (n_sma - 4) / (n_sma_max - 4)
                        * (n_sma - 2) / n_sma
                        * n_sma_max / (n_sma_max - 2))
        step_size_rect = learning_rate * rect / bias1
        step_size_plain = learning_rate / bias1
        use_rect = n_sma >= 5.0

        def upd(m, v, p):
            rect_step = step_size_rect * m / (jnp.sqrt(v) + eps)
            plain_step = step_size_plain * m
            delta = jnp.where(use_rect, rect_step, plain_step)
            if params is not None and weight_decay != 0:
                delta = delta + weight_decay * learning_rate * p
            return -delta

        if params is not None:
            new_updates = jax.tree_util.tree_map(upd, exp_avg, exp_avg_sq,
                                                 params)
        else:
            new_updates = jax.tree_util.tree_map(
                lambda m, v: upd(m, v, None), exp_avg, exp_avg_sq)
        return new_updates, RAdamState(count, exp_avg, exp_avg_sq)

    return optax.GradientTransformation(init_fn, update_fn)


def build_optimizer(optim_algo: str = "RAdam", learning_rate: float = 1e-4,
                    weight_decay: float = 1e-6,
                    grad_clip_val: Optional[float] = 1.0
                    ) -> optax.GradientTransformation:
    """Optimizer factory (configure_optimizers,
    tts_lightning_modules.py:551-566) + trainer-level global-norm clipping
    (configs/RADMMM_train_config.yaml)."""
    if optim_algo == "RAdam":
        tx = radam_exact(learning_rate, weight_decay=weight_decay)
    elif optim_algo == "Adam":
        tx = optax.adamw(learning_rate, weight_decay=weight_decay)
    else:
        raise ValueError(f"Unrecognized optimizer {optim_algo}")
    if grad_clip_val:
        tx = optax.chain(optax.clip_by_global_norm(grad_clip_val), tx)
    return tx
