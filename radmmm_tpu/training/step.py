"""Jitted train/val steps: loss aggregation, grads, optimizer, phases.

Functional equivalent of TTSModel.training_step/validation_step
(tts_lightning_modules.py:643-859). Step-phase-dependent behavior
(binarization from iter 20k, KL from 25k — configs/RADMMM_model_config.yaml)
is resolved host-side into static flags so each phase is its own compiled
executable (SURVEY.md §7.3) instead of retracing.

Distribution: the caller jits these functions over a Mesh with the batch
sharded on the `data` axis and params laid out by parallel.mesh — XLA's
GSPMD derives the gradient all-reduces from the global-mean loss, replacing
DDP's allreduce hooks.
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import optax

from radmmm_tpu.losses.flow import (RADMMMLoss, AttributeRegressionLoss,
                                    AttributeBCELoss)
from radmmm_tpu.losses.regularizers import (
    VarianceCovarianceEmbeddingRegLoss, AttributeMinCrossCovarianceRegLoss)
from radmmm_tpu.models.flow_decoder import squeeze_time
from radmmm_tpu.models.tts import TTSModel, mel_scale
from radmmm_tpu.ops.invertible import (whitening_stats,
                                       whitening_params_from_stats)
from radmmm_tpu.utils.masking import SeqLens


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class TrainState:
    step: jax.Array
    params: Any
    buffers: Any
    batch_stats: Any
    spectral: Any
    opt_state: Any

    def model_variables(self):
        v = {"params": self.params}
        for name in ("buffers", "batch_stats", "spectral"):
            coll = getattr(self, name)
            if coll:
                v[name] = coll
        return v


@dataclasses.dataclass
class LossConfig:
    """Weights/switches mirroring the shipped configs."""
    sigma: float = 1.0
    n_group_size: int = 2
    ctc_blank_logprob: float = -1.0
    binarization_loss_weight: float = 1.0
    ctc_loss_weight: float = 0.1
    f0_loss_voiced_only: bool = True
    f0_weight: float = 1.0
    energy_weight: float = 1.0
    vpred_weight: float = 1.0
    duration_weight: float = 1.0
    # 'regression' (masked MSE) or 'bce'. The shipped reference configs use
    # regression for all four (even voiced, on raw logits —
    # configs/RADMMM_vpredmodel_config.yaml); utils/config.py sets these
    # from the configured loss class, so the bce default below only applies
    # to hand-built LossConfigs.
    f0_loss_type: str = "regression"
    energy_loss_type: str = "regression"
    vpred_loss_type: str = "bce"
    duration_loss_type: str = "regression"
    speaker_reg: Optional[Dict[str, float]] = None    # variance/covariance
    accent_reg: Optional[Dict[str, float]] = None
    cross_covariance_weight: Optional[float] = None
    binarization_start_iter: int = 20000
    kl_loss_start_iter: int = 25000


def compute_losses(model: TTSModel, cfg: LossConfig, params, outputs, batch,
                   binarization_on: bool):
    """All loss terms as {name: (value, weight)}
    (tts_lightning_modules.py:682-744)."""
    in_lens = SeqLens.create(batch["input_lengths"], batch["text"].shape[1])
    out_lens = SeqLens.create(batch["output_lengths"], batch["mel"].shape[1])

    ld = RADMMMLoss(
        sigma=cfg.sigma, n_group_size=cfg.n_group_size,
        ctc_blank_logprob=cfg.ctc_blank_logprob,
        binarization_loss_weight=cfg.binarization_loss_weight,
        ctc_loss_weight=cfg.ctc_loss_weight)(
            outputs, in_lens, out_lens, binarization_on=binarization_on)

    def attr_loss(loss_type, prefix, weight):
        cls = AttributeBCELoss if loss_type == "bce" else \
            AttributeRegressionLoss
        return cls(prefix, weight)

    if "f0_outputs" in outputs:
        mask = (batch["voiced_mask"][..., None]
                if cfg.f0_loss_voiced_only else None)
        ld.update(attr_loss(cfg.f0_loss_type, "f0_", cfg.f0_weight)(
            outputs["f0_outputs"], out_lens, mask=mask))
    if "energy_outputs" in outputs:
        ld.update(attr_loss(cfg.energy_loss_type, "energy_",
                            cfg.energy_weight)(
            outputs["energy_outputs"], out_lens))
    if "voiced_outputs" in outputs:
        ld.update(attr_loss(cfg.vpred_loss_type, "vpred_",
                            cfg.vpred_weight)(
            outputs["voiced_outputs"], out_lens))
    if "duration_outputs" in outputs:
        ld.update(attr_loss(cfg.duration_loss_type, "duration_",
                            cfg.duration_weight)(
            outputs["duration_outputs"], None,
            mask=in_lens.mask[..., None]))

    spk_table = params["speaker_embeddings"]["embedding"]
    if cfg.speaker_reg is not None:
        ld.update(VarianceCovarianceEmbeddingRegLoss(
            "speaker", cfg.speaker_reg.get("variance", 0.0),
            cfg.speaker_reg.get("covariance", 0.0))(spk_table))
    if cfg.accent_reg is not None and model.config.use_accent:
        acc_table = params["accent_embeddings"]["embedding"]
        ld.update(VarianceCovarianceEmbeddingRegLoss(
            "accent", cfg.accent_reg.get("variance", 0.0),
            cfg.accent_reg.get("covariance", 0.0))(acc_table))
    if cfg.cross_covariance_weight is not None and model.config.use_accent:
        acc_table = params["accent_embeddings"]["embedding"]
        ld.update(AttributeMinCrossCovarianceRegLoss(
            "speaker", "accent", cfg.cross_covariance_weight)(
                outputs["spk_vecs"], outputs["accent_vecs"],
                spk_table, acc_table))
    return ld


def total_loss(loss_dict):
    return sum(v * w for v, w in loss_dict.values())


def create_train_state(model: TTSModel, tx: optax.GradientTransformation,
                       sample_batch, rng) -> TrainState:
    init_fn = jax.jit(functools.partial(model.init, binarize=False,
                                        train=True))
    variables = init_fn({"params": rng, "dropout": rng}, sample_batch)
    params = variables["params"]
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        buffers=variables.get("buffers", {}),
        batch_stats=variables.get("batch_stats", {}),
        spectral=variables.get("spectral", {}),
        opt_state=tx.init(params),
    )


def make_train_step(model: TTSModel, cfg: LossConfig,
                    tx: optax.GradientTransformation,
                    binarize: bool, kl_on: bool,
                    sync_bn: bool = False) -> Callable:
    """One compiled phase of the training step. Jit with donate_argnums=0."""

    mutable = ["batch_stats", "spectral"]

    def train_step(state: TrainState, batch, dropout_rng):
        def loss_fn(params):
            variables = {"params": params, "buffers": state.buffers,
                         "batch_stats": state.batch_stats,
                         "spectral": state.spectral}
            outputs, mut = model.apply(
                variables, batch, binarize=binarize, train=True,
                sync_bn=sync_bn, mutable=mutable,
                rngs={"dropout": dropout_rng})
            ld = compute_losses(model, cfg, params, outputs, batch,
                                binarization_on=(binarize and kl_on))
            return total_loss(ld), (ld, mut)

        (loss, (ld, mut)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        updates, new_opt_state = tx.update(grads, state.opt_state,
                                           state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = TrainState(
            step=state.step + 1,
            params=new_params,
            buffers=state.buffers,
            batch_stats=mut.get("batch_stats", state.batch_stats),
            spectral=mut.get("spectral", state.spectral),
            opt_state=new_opt_state,
        )
        metrics = {k: v for k, (v, _) in ld.items()}
        metrics["loss"] = loss
        metrics["grad_norm"] = optax.global_norm(grads)
        return new_state, metrics

    return train_step


def stack_raw_batches(raws):
    """Stack K same-shape raw_arrays() dicts along a new leading axis
    (host-side prep for make_train_megastep; see data/loader.py)."""
    from radmmm_tpu.data.loader import stack_raw_batches as _stack
    return _stack(raws)


def make_train_megastep(model: TTSModel, cfg: LossConfig,
                        tx: optax.GradientTransformation,
                        featurizer, binarize: bool, kl_on: bool,
                        sync_bn: bool = False) -> Callable:
    """K featurize+train steps in ONE jitted program.

    Takes `stacked` — a stack_raw_batches() pytree with leading axis K —
    and lax.scans the device featurization (mel/pYIN/priors,
    data/collate.py Featurizer.featurize_raw) followed by the train step
    over it. Purpose: a per-dispatch host cost (pytree flatten + RPC; ~27ms
    on a relay-attached chip, still ~ms on a local PCIe host) is paid once
    per K batches instead of twice per batch (featurize + step), so the
    end-to-end product loop tracks the pure step time. The reference
    overlaps featurization with CPU DataLoader workers (data.py:419-610);
    on TPU the featurizer runs on-device, so the equivalent overlap is
    batching the dispatches, not threading.

    Returns (state, metrics) where each metric is stacked (K,) — the
    caller logs metrics[-1] or the mean. jit with donate_argnums=0.
    """
    step_fn = make_train_step(model, cfg, tx, binarize=binarize,
                              kl_on=kl_on, sync_bn=sync_bn)

    def megastep(state: TrainState, stacked, dropout_rng):
        K = jax.tree_util.tree_leaves(stacked)[0].shape[0]
        keys = jax.vmap(lambda i: jax.random.fold_in(dropout_rng, i))(
            jnp.arange(K))

        def body(st, xs):
            dkey, raw = xs
            # mel-noise key from the featurizer's own (seed, process,
            # global step) stream — identical to the per-batch fallback
            # path, so group scheduling never changes the augmentation a
            # given step sees (ADVICE r4)
            fkey = featurizer.noise_key_for_step(st.step)
            batch = featurizer.featurize_raw(raw, fkey)
            return step_fn(st, batch, dkey)

        return jax.lax.scan(body, state, (keys, stacked))

    return megastep


def make_val_step(model: TTSModel, cfg: LossConfig,
                  binarize: bool = True) -> Callable:
    def val_step(state: TrainState, batch):
        outputs = model.apply(
            state.model_variables(), batch, binarize=binarize, train=False,
            mutable=False)
        ld = compute_losses(model, cfg, state.params, outputs, batch,
                            binarization_on=binarize)
        metrics = {k: v for k, (v, _) in ld.items()}
        metrics["loss"] = total_loss(ld)
        return metrics

    return val_step


def make_whitening_init(model: TTSModel,
                        axis_name: Optional[str] = None) -> Callable:
    """Data-dependent init pass for the step-0 whitening conv, run once
    before training (see models/flow_decoder.init_whitening_from_batch)."""
    g = model.config.decoder.get("n_group_size", 1)

    def init_pass(state: TrainState, batch):
        mel = mel_scale(batch["mel"]) if model.config.scale_mel \
            else batch["mel"]
        out_lens = SeqLens.create(batch["output_lengths"], mel.shape[1])
        z = squeeze_time(mel, g)
        glens = out_lens.downsample(g)
        mean, covar = whitening_stats(z, glens.mask, axis_name=axis_name)
        new = whitening_params_from_stats(mean, covar)

        params = dict(state.params)
        f0p = dict(params["decoder"]["flow_0"])
        wp = dict(f0p["invtbl_conv"])
        wp["upper"], wp["upper_diag"] = new["upper"], new["upper_diag"]
        f0p["invtbl_conv"] = wp
        dec = dict(params["decoder"]); dec["flow_0"] = f0p
        params["decoder"] = dec

        buffers = dict(state.buffers)
        decb = dict(buffers.get("decoder", {}))
        f0b = dict(decb.get("flow_0", {}))
        wb = dict(f0b.get("invtbl_conv", {}))
        wb["input_mean"] = new["input_mean"]
        wb["initialized"] = jnp.ones((), jnp.bool_)
        f0b["invtbl_conv"] = wb
        decb["flow_0"] = f0b
        buffers["decoder"] = decb

        return dataclasses.replace(state, params=params, buffers=buffers)

    return init_pass


def device_batch(batch: Dict[str, Any]) -> Dict[str, Any]:
    """Drop host-only metadata (paths, raw text, language strings) so the
    batch is a pure array pytree for jit."""
    return {k: v for k, v in batch.items()
            if not isinstance(v, (str, list, tuple))}


def phase_flags(step: int, cfg: LossConfig):
    """Host-side phase resolution -> (binarize, kl_on) static flags."""
    return (step >= cfg.binarization_start_iter,
            step > cfg.kl_loss_start_iter)
