"""Windowed loss-term ablation of the flagship train step.

Builds several variants of the jitted train step, each with a subset of
loss terms dropped BEFORE total_loss — XLA dead-code-eliminates the
forward+backward subgraphs that only those terms reference — and times
every variant with the same relay-robust windowed fori_loop as bench.py
((t(2K)-t(K))/K, donated carry). The difference full-vs-variant is the
true on-device cost of that component (fwd+bwd+optimizer traffic for its
params), free of the tunnel's per-dispatch noise that corrupts
per-kernel micro-timings (~27 ms floor per dispatch on this relay).

Usage: python scripts/profile_step_ablation.py [--bf16] [--batch 32]
"""
from __future__ import annotations

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bf16", action="store_true")
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--tmel", type=int, default=512)
    ap.add_argument("--k", type=int, default=20)
    ap.add_argument("--variants", type=str, default=None,
                    help="comma-separated variant indices to run (default all)")
    ap.add_argument("--remat", type=str, default="on",
                    help="decoder remat: on | off | <policy name>")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import optax
    from radmmm_tpu.models.tts import TTSModel, default_radmmm_config
    from radmmm_tpu.ops.conv import set_conv_precision
    from radmmm_tpu.training.optim import build_optimizer
    from radmmm_tpu.training import step as step_mod
    from radmmm_tpu.training.step import (LossConfig, TrainState,
                                          create_train_state, compute_losses)

    set_conv_precision("bf16" if args.bf16 else "f32")
    B, T_TEXT, T_MEL = args.batch, 96, args.tmel

    dec = dict(default_radmmm_config().decoder)
    dec["remat"] = False if args.remat == "off" else \
        True if args.remat == "on" else args.remat
    model = TTSModel(config=default_radmmm_config(decoder=dec))
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
    tx = build_optimizer("RAdam", learning_rate=1e-4, weight_decay=1e-6,
                         grad_clip_val=1.0)
    state0 = create_train_state(model, tx, batch, jax.random.key(0))
    cfg = LossConfig(n_group_size=2, cross_covariance_weight=1.0,
                     speaker_reg={"variance": 0.0, "covariance": 0.0})

    def make_filtered_step(keep, binarize=True):
        """Train step whose total loss keeps only terms passing keep(name);
        grads/optimizer otherwise identical to make_train_step."""
        mutable = ["batch_stats", "spectral"]

        def train_step(state, batch, dropout_rng):
            def loss_fn(params):
                variables = {"params": params, "buffers": state.buffers,
                             "batch_stats": state.batch_stats,
                             "spectral": state.spectral}
                outputs, mut = model.apply(
                    variables, batch, binarize=binarize, train=True,
                    mutable=mutable, rngs={"dropout": dropout_rng})
                ld = compute_losses(model, cfg, params, outputs, batch,
                                    binarization_on=binarize)
                tot = sum(v * w for k, (v, w) in ld.items() if keep(k))
                return tot, mut
            (loss, mut), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(state.params)
            updates, new_opt = tx.update(grads, state.opt_state, state.params)
            new_params = optax.apply_updates(state.params, updates)
            return TrainState(
                step=state.step + 1, params=new_params, buffers=state.buffers,
                batch_stats=mut.get("batch_stats", state.batch_stats),
                spectral=mut.get("spectral", state.spectral),
                opt_state=new_opt), loss

        return train_step

    K = args.k

    def time_step(step_fn, name):
        def run_n(state, batch, key, n):
            def body(i, carry):
                st, _ = carry
                st, loss = step_fn(st, batch, jax.random.fold_in(key, i))
                return (st, loss)
            return jax.lax.fori_loop(0, n, body,
                                     (state, jnp.zeros(())))
        runner = jax.jit(run_n, donate_argnums=0)
        key = jax.random.key(1)
        state = jax.tree.map(jnp.copy, state0)
        st, loss = runner(state, batch, key, jnp.asarray(K, jnp.int32))
        float(loss)

        def window(n, st):
            t0 = time.perf_counter()
            st, loss = runner(st, batch, jax.random.fold_in(key, n),
                              jnp.asarray(n, jnp.int32))
            float(loss)
            return time.perf_counter() - t0, st

        # median of 3 window deltas: the first timed window after compile
        # can run 3-4x long (donation/defrag glitch), which corrupts a
        # single (t(2K)-t(K)) pair — consecutive healthy windows agree to
        # <1 ms (see bench.py)
        deltas = []
        for _ in range(3):
            t_k, st = window(K, st)
            t_2k, st = window(2 * K, st)
            deltas.append(max(t_2k - t_k, 1e-6) / K * 1e3)
        ms = sorted(deltas)[len(deltas) // 2]
        spread = max(deltas) - min(deltas)
        print(f"{name:42s} {ms:8.2f} ms/step (spread {spread:.1f})",
              flush=True)
        del st, runner
        return ms

    ATTR = ("f0_", "energy_", "vpred_", "duration_")
    variants = [
        ("full step", lambda k: True, True),
        ("- ctc loss", lambda k: k != "loss_ctc", True),
        ("- attribute predictors", lambda k: not k.startswith(ATTR), True),
        ("- mel flow nll", lambda k: k not in ("loss_mel", "loss_prior_mel"),
         True),
        ("only mel flow nll", lambda k: k in ("loss_mel", "loss_prior_mel"),
         True),
        ("full, soft attn (no MAS)", lambda k: k != "binarization_loss",
         False),
    ]
    print(f"B={B} T_mel={T_MEL} precision="
          f"{'bf16' if args.bf16 else 'f32'} K={K} remat={args.remat}",
          flush=True)
    sel = (list(range(len(variants))) if args.variants is None
           else [int(i) for i in args.variants.split(",")])
    full_ms = None
    for i in sel:
        name, keep, binarize = variants[i]
        ms = time_step(make_filtered_step(keep, binarize), name)
        if full_ms is None:
            full_ms = ms
        else:
            print(f"{'':42s} {full_ms - ms:+8.2f} ms vs full", flush=True)


if __name__ == "__main__":
    main()
