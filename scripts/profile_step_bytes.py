"""Attribute the train step's HBM bytes (XLA cost analysis) to components.

Compiles ablated variants of the flagship train step and prints each
variant's FLOPs and bytes-accessed; deltas localize where the HBM-bound
step's bytes live (the step is at ~97% of the v5e HBM roofline, so bytes
are the only perf lever left — VERDICT round-2 next #1).

Compile-only (cost analysis needs no execution), so each variant costs one
remote compile. Usage: python scripts/profile_step_bytes.py [--bf16]
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def build_step(model, tx):
    import jax
    from radmmm_tpu.training.step import LossConfig, make_train_step

    cfg = LossConfig(n_group_size=2, cross_covariance_weight=1.0,
                     speaker_reg={"variance": 0.0, "covariance": 0.0})
    return make_train_step(model, cfg, tx, binarize=True, kl_on=True)


def analyze(name, model, batch, fwd_only=False, no_opt=False):
    import jax
    import jax.numpy as jnp
    from radmmm_tpu.training.optim import build_optimizer
    from radmmm_tpu.training.step import (LossConfig, compute_losses,
                                          create_train_state, total_loss)

    tx = build_optimizer("RAdam", learning_rate=1e-4, weight_decay=1e-6,
                         grad_clip_val=1.0)
    state = create_train_state(model, tx, batch, jax.random.key(0))
    key = jax.random.key(1)
    t0 = time.time()
    if fwd_only:
        cfg = LossConfig(n_group_size=2, cross_covariance_weight=1.0,
                         speaker_reg={"variance": 0.0, "covariance": 0.0})

        def fwd(params, batch, k):
            variables = {"params": params, "buffers": state.buffers,
                         "batch_stats": state.batch_stats,
                         "spectral": state.spectral}
            outputs, _ = model.apply(variables, batch, binarize=True,
                                     train=True,
                                     mutable=["batch_stats", "spectral"],
                                     rngs={"dropout": k})
            ld = compute_losses(model, cfg, params, outputs, batch,
                                binarization_on=True)
            return total_loss(ld)

        c = jax.jit(fwd).lower(state.params, batch, key).compile()
    elif no_opt:
        cfg = LossConfig(n_group_size=2, cross_covariance_weight=1.0,
                         speaker_reg={"variance": 0.0, "covariance": 0.0})

        def fwd(params, batch, k):
            variables = {"params": params, "buffers": state.buffers,
                         "batch_stats": state.batch_stats,
                         "spectral": state.spectral}
            outputs, _ = model.apply(variables, batch, binarize=True,
                                     train=True,
                                     mutable=["batch_stats", "spectral"],
                                     rngs={"dropout": k})
            ld = compute_losses(model, cfg, params, outputs, batch,
                                binarization_on=True)
            return total_loss(ld)

        grad = jax.jit(jax.grad(fwd))
        c = grad.lower(state.params, batch, key).compile()
    else:
        step = build_step(model, tx)
        c = jax.jit(step, donate_argnums=0).lower(state, batch, key).compile()
    ca = c.cost_analysis()
    dt = time.time() - t0
    flops, byt = float(ca.get("flops", 0)), float(ca.get("bytes accessed", 0))
    print(f"{name:34s} flops={flops / 1e12:6.3f}T bytes={byt / 1e9:7.2f}GB "
          f"(compile {dt:.0f}s)", flush=True)
    return flops, byt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bf16", action="store_true", default=True)
    args = ap.parse_args()

    import jax.numpy as jnp
    from radmmm_tpu.models.tts import TTSModel, default_radmmm_config
    from radmmm_tpu.ops.conv import set_conv_precision

    set_conv_precision("bf16" if args.bf16 else "f32")
    B, T_TEXT, T_MEL = 8, 96, 512
    rng = np.random.default_rng(0)
    prior = rng.uniform(0.1, 1.0, (B, T_MEL, T_TEXT)).astype(np.float32)
    prior /= prior.sum(-1, keepdims=True)
    batch = {
        "text": jnp.asarray(rng.integers(0, 426, (B, T_TEXT)), jnp.int32),
        "input_lengths": jnp.full((B,), T_TEXT, jnp.int32),
        "mel": jnp.asarray(rng.standard_normal((B, T_MEL, 80)), jnp.float32),
        "output_lengths": jnp.full((B,), T_MEL, jnp.int32),
        "speaker_ids": jnp.asarray(rng.integers(0, 21, (B,)), jnp.int32),
        "accent_ids": jnp.asarray(rng.integers(0, 7, (B,)), jnp.int32),
        "f0": jnp.asarray(rng.uniform(4, 6, (B, T_MEL)), jnp.float32),
        "voiced_mask": jnp.asarray(rng.integers(0, 2, (B, T_MEL)),
                                   jnp.float32),
        "energy_avg": jnp.asarray(rng.uniform(0, 1, (B, T_MEL)),
                                  jnp.float32),
        "attn_prior": jnp.asarray(prior),
        "speaker_f0_mean": jnp.full((B,), 5.0, jnp.float32),
        "speaker_f0_std": jnp.full((B,), 0.3, jnp.float32),
    }

    def cfg_with(remat=True, **dec_over):
        cfg = default_radmmm_config()
        dec = dict(cfg.decoder)
        dec["remat"] = remat
        dec.update(dec_over)
        return default_radmmm_config(decoder=dec)

    full = TTSModel(config=cfg_with())
    analyze("full step (fwd+bwd+RAdam)", full, batch)
    analyze("fwd+bwd only (no optimizer)", full, batch, no_opt=True)
    analyze("fwd only", full, batch, fwd_only=True)
    analyze("full step, remat OFF", TTSModel(config=cfg_with(remat=False)),
            batch)
    analyze("step, 4 flows (of 8)", TTSModel(config=cfg_with(n_flows=4)),
            batch)
    analyze("step, no context LSTM",
            TTSModel(config=cfg_with(use_context_lstm=False)), batch)


if __name__ == "__main__":
    main()
