"""Ablation timing of the flagship train step on the current backend.

Times jitted pieces of the training computation at the bench regime
(B=8 x 512 mel frames, f32) so optimization effort goes where the
milliseconds are: full step, forward-only, MAS, encoder, attention,
flow decoder fwd, attribute predictors, and the context/DAP LSTMs under
both scan and Pallas backends.

Usage: python scripts/profile_train_step.py [--bf16] [--iters 10]
"""
from __future__ import annotations

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def timed(fn, *args, iters=10, name=""):
    import jax
    out = fn(*args)
    jax.block_until_ready(out)
    # force real completion through the relay: fetch one scalar
    leaf = jax.tree_util.tree_leaves(out)[0]
    float(np.asarray(leaf).ravel()[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
        leaf = jax.tree_util.tree_leaves(out)[0]
        float(np.asarray(leaf).ravel()[0])
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:38s} {dt * 1e3:9.2f} ms")
    return dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bf16", action="store_true")
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--tmel", type=int, default=512)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from radmmm_tpu.models.tts import TTSModel, default_radmmm_config
    from radmmm_tpu.ops.conv import set_conv_precision
    from radmmm_tpu.training.optim import build_optimizer
    from radmmm_tpu.training.step import (LossConfig, create_train_state,
                                          make_train_step)
    from radmmm_tpu.ops.alignment import mas_width1

    set_conv_precision("bf16" if args.bf16 else "f32")
    B, T_TEXT, T_MEL = args.batch, 96, args.tmel
    it = args.iters

    model = TTSModel(config=default_radmmm_config())
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
    tx = build_optimizer("RAdam", learning_rate=1e-4)
    state = create_train_state(model, tx, batch, jax.random.key(0))
    cfg = LossConfig(n_group_size=2, cross_covariance_weight=1.0,
                     speaker_reg={"variance": 0.0, "covariance": 0.0})

    print(f"backend={jax.devices()[0].platform} B={B} T_mel={T_MEL} "
          f"T_text={T_TEXT} precision={'bf16' if args.bf16 else 'f32'}")

    # full jitted train step (binarized + KL)
    step = jax.jit(make_train_step(model, cfg, tx, binarize=True,
                                   kl_on=True))
    key = jax.random.key(1)
    timed(lambda s, b, k: step(s, b, k)[1]["loss"], state, batch, key,
          iters=it, name="train step (fwd+bwd+RAdam)")

    # forward only (binarize)
    @jax.jit
    def fwd(variables, b, k):
        out, _ = model.apply(variables, b, binarize=True, train=True,
                             mutable=["batch_stats", "spectral"],
                             rngs={"dropout": k})
        return out["z_mel"].sum() + out["attn"].sum()

    variables = state.model_variables()
    timed(fwd, variables, batch, key, iters=it, name="model forward (binarize)")

    @jax.jit
    def fwd_soft(variables, b, k):
        out, _ = model.apply(variables, b, binarize=False, train=True,
                             mutable=["batch_stats", "spectral"],
                             rngs={"dropout": k})
        return out["z_mel"].sum() + out["attn"].sum()

    timed(fwd_soft, variables, batch, key, iters=it,
          name="model forward (soft only)")

    # MAS alone
    mas = jax.jit(lambda p: mas_width1(
        p, batch["input_lengths"], batch["output_lengths"]))
    timed(mas, jnp.asarray(prior), iters=it, name="MAS viterbi (device)")

    # LSTM backends at the context-LSTM shape (B, T/2, 1024 -> 2x512)
    from radmmm_tpu.ops import lstm as lstm_mod
    x = jnp.asarray(rng.standard_normal((B, T_MEL // 2, 1024)), jnp.float32)
    m = lstm_mod.MaskedLSTM(hidden=512)
    mask = jnp.ones((B, T_MEL // 2), jnp.float32)
    vs = jax.jit(m.init)(jax.random.key(0), x, mask)
    for backend in ("scan", "pallas"):
        lstm_mod.set_lstm_backend(backend)
        f = jax.jit(lambda v, x, mk: m.apply(v, x, mk).sum())
        try:
            timed(f, vs, x, mask, iters=it,
                  name=f"BiLSTM-512 T={T_MEL//2} ({backend})")
        except Exception as e:
            print(f"lstm backend {backend}: failed ({type(e).__name__}: {e})")
    lstm_mod.set_lstm_backend("scan")


if __name__ == "__main__":
    main()
