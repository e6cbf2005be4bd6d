"""Flow NLL + attention losses (CTC, binarization) and their aggregation.

Reference: loss.py:85-211, 500-538. Loss dicts map name -> (value, weight),
same contract as the reference so logging/aggregation match.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from radmmm_tpu.losses.ctc import attention_ctc_loss
from radmmm_tpu.utils.masking import SeqLens


def compute_flow_loss(z, log_det_W_list, log_s_list, n_elements, n_dims,
                      mask, sigma=1.0):
    """Masked flow NLL (loss.py:85-110).

    z: (B, Tg, C) latents; mask: (B, Tg) float; n_elements = Σ valid frames.
    """
    m = mask[..., None]
    log_s_total = sum(jnp.sum(ls * m) for ls in log_s_list)
    log_det_W_total = sum(log_det_W_list) if log_det_W_list else 0.0
    log_det_W_total = log_det_W_total * n_elements

    z = z * m
    prior_nll = jnp.sum(z * z) / (2 * sigma * sigma)
    loss = prior_nll - log_s_total - log_det_W_total
    denom = n_elements * n_dims
    return loss / denom, prior_nll / denom


def attention_binarization_loss(hard_attention, soft_attention):
    """BCE of soft attention at hard-alignment positions (loss.py:143-151).

    Static-shape version of `soft[hard == 1]`: a masked mean of -log(soft).
    """
    hard = jax.lax.stop_gradient(hard_attention)
    logp = jnp.log(jnp.clip(soft_attention, 1e-12, 1.0))
    return -jnp.sum(hard * logp) / jnp.maximum(jnp.sum(hard), 1.0)


def attention_loss(attn, attn_soft, attn_logprob, binarization_on: bool,
                   in_lens: SeqLens, out_lens: SeqLens,
                   ctc_blank_logprob=-1.0, binarization_loss_weight=1.0,
                   ctc_loss_weight=0.1):
    """AttentionLoss (loss.py:153-179); the kl_loss_start_iter gate becomes
    the static `binarization_on` flag (resolved host-side per phase to keep
    the jitted graph static)."""
    loss_dict = {}
    ctc = attention_ctc_loss(attn_logprob, in_lens.lengths, out_lens.lengths,
                             blank_logprob=ctc_blank_logprob)
    loss_dict["loss_ctc"] = (ctc, ctc_loss_weight)
    if binarization_on:
        b = attention_binarization_loss(attn, attn_soft)
    else:
        b = 0.0
    loss_dict["binarization_loss"] = (b, binarization_loss_weight)
    return loss_dict


class RADMMMLoss:
    """Flow NLL + attention losses (loss.py:500-538). Stateless config."""

    def __init__(self, sigma=1.0, n_group_size=1, ctc_blank_logprob=-1.0,
                 kl_loss_start_iter=5000, binarization_loss_weight=1.0,
                 ctc_loss_weight=0.1, use_spk_embed_reg=False,
                 use_accent_embed_reg=False, reg_loss_config=None,
                 use_spk_accent_cross_covariance=False,
                 cross_reg_loss_config=None):
        self.sigma = sigma
        self.n_group_size = n_group_size
        self.ctc_blank_logprob = ctc_blank_logprob
        self.kl_loss_start_iter = kl_loss_start_iter
        self.binarization_loss_weight = binarization_loss_weight
        self.ctc_loss_weight = ctc_loss_weight

    def __call__(self, model_output, in_lens: SeqLens, out_lens: SeqLens,
                 binarization_on: bool):
        loss_dict = {}
        if "z_mel" in model_output and model_output["z_mel"] is not None:
            glens = out_lens.downsample(self.n_group_size)
            n_elements = glens.lengths.sum().astype(jnp.float32)
            n_dims = model_output["z_mel"].shape[-1]
            loss_mel, loss_prior = compute_flow_loss(
                model_output["z_mel"], model_output["log_det_W_list"],
                model_output["log_s_list"], n_elements, n_dims,
                glens.fmask(), self.sigma)
            loss_dict["loss_mel"] = (loss_mel, 1.0)
            loss_dict["loss_prior_mel"] = (loss_prior, 0.0)

        loss_dict.update(attention_loss(
            model_output["attn"], model_output["attn_soft"],
            model_output["attn_logprob"], binarization_on, in_lens, out_lens,
            self.ctc_blank_logprob, self.binarization_loss_weight,
            self.ctc_loss_weight))
        return loss_dict


# RADTTSLoss is the accent-free special case with identical math
# (loss.py:182-211).
RADTTSLoss = RADMMMLoss


def masked_regression_loss(prediction, target, mask):
    """Masked MSE (AttributeRegressionLoss, loss.py:233-249).

    mask: broadcastable to prediction; mean over valid entries.
    """
    m = mask.astype(prediction.dtype)
    se = (prediction - target) ** 2 * m
    return jnp.sum(se) / jnp.maximum(jnp.sum(m), 1.0)


def masked_bce_loss(prediction_logits, target, mask):
    """Masked BCE-with-logits (AttributeBCELoss, loss.py:213-230)."""
    m = mask.astype(prediction_logits.dtype)
    x, y = prediction_logits, target
    per = jnp.maximum(x, 0) - x * y + jnp.log1p(jnp.exp(-jnp.abs(x)))
    return jnp.sum(per * m) / jnp.maximum(jnp.sum(m), 1.0)


class RADTTSDeterministicLoss:
    """L1 mel loss + attention losses, for the deterministic decoder regime
    (loss.py:351-376)."""

    def __init__(self, ctc_blank_logprob=-1.0, kl_loss_start_iter=5000,
                 binarization_loss_weight=1.0, ctc_loss_weight=0.1):
        self.ctc_blank_logprob = ctc_blank_logprob
        self.binarization_loss_weight = binarization_loss_weight
        self.ctc_loss_weight = ctc_loss_weight

    def __call__(self, model_output, in_lens: SeqLens, out_lens: SeqLens,
                 binarization_on: bool):
        loss_dict = {}
        if model_output.get("mel_hat") is not None:
            m = out_lens.fmask()[..., None]
            mel, mel_hat = model_output["mel"], model_output["mel_hat"]
            n_dims = mel.shape[-1]
            loss = (jnp.abs(mel - mel_hat) * m).sum() / (
                n_dims * jnp.maximum(m.sum(), 1.0))
            loss_dict["mel_mae_loss"] = (loss, 1.0)
        loss_dict.update(attention_loss(
            model_output["attn"], model_output["attn_soft"],
            model_output["attn_logprob"], binarization_on, in_lens, out_lens,
            self.ctc_blank_logprob, self.binarization_loss_weight,
            self.ctc_loss_weight))
        return loss_dict


class RADTTSDiffusionLoss:
    """Noise-prediction MSE + attention losses (loss.py:378-406)."""

    def __init__(self, ctc_blank_logprob=-1.0, kl_loss_start_iter=5000,
                 binarization_loss_weight=1.0, ctc_loss_weight=0.1):
        self.ctc_blank_logprob = ctc_blank_logprob
        self.binarization_loss_weight = binarization_loss_weight
        self.ctc_loss_weight = ctc_loss_weight

    def __call__(self, model_output, in_lens: SeqLens, out_lens: SeqLens,
                 binarization_on: bool):
        loss_dict = {}
        if model_output.get("noise_hat") is not None:
            m = out_lens.fmask()[..., None]
            noise, noise_hat = model_output["noise"], model_output["noise_hat"]
            n_dims = noise.shape[-1]
            loss = (((noise - noise_hat) ** 2) * m).sum() / (
                n_dims * jnp.maximum(m.sum(), 1.0))
            loss_dict["noise_mse_loss"] = (loss, 1.0)
        loss_dict.update(attention_loss(
            model_output["attn"], model_output["attn_soft"],
            model_output["attn_logprob"], binarization_on, in_lens, out_lens,
            self.ctc_blank_logprob, self.binarization_loss_weight,
            self.ctc_loss_weight))
        return loss_dict


class RADTTSE2EGANLoss:
    """Multi-res STFT reconstruction + attention losses for the end-to-end
    waveform regime (loss.py:408-464)."""

    def __init__(self, ctc_blank_logprob=-1.0, kl_loss_start_iter=5000,
                 binarization_loss_weight=1.0, ctc_loss_weight=0.1,
                 stft_loss_sc_weight=1.0, stft_loss_mag_weight=1.0,
                 fft_lengths=(1024, 2048, 512, 64, 8192),
                 hop_lengths=(120, 240, 50, 10, 2000),
                 win_lengths=(600, 1200, 240, 50, 8000),
                 sampling_rate=22050, a_weighting=True):
        from radmmm_tpu.losses.stft_loss import MultiResolutionSTFTLoss
        self.stft_loss_sc_weight = stft_loss_sc_weight
        self.stft_loss_mag_weight = stft_loss_mag_weight
        self.ctc_blank_logprob = ctc_blank_logprob
        self.binarization_loss_weight = binarization_loss_weight
        self.ctc_loss_weight = ctc_loss_weight
        self.mrstft = MultiResolutionSTFTLoss(
            fft_lengths, hop_lengths, win_lengths, sampling_rate, a_weighting)

    def __call__(self, model_output, audio, audio_lens, in_lens: SeqLens,
                 out_lens: SeqLens, binarization_on: bool):
        loss_dict = {}
        audio_hat = model_output["audio_hat"]
        T = min(audio.shape[-1], audio_hat.shape[-1])
        audio, audio_hat = audio[..., :T], audio_hat[..., :T]
        len_ratios = audio_lens / jnp.maximum(audio_lens.max(), 1)
        sc, mag = self.mrstft(audio, audio_hat, len_ratios)
        loss_dict["stft_loss_sc"] = (sc, self.stft_loss_sc_weight)
        loss_dict["stft_loss_mag"] = (mag, self.stft_loss_mag_weight)
        loss_dict.update(attention_loss(
            model_output["attn"], model_output["attn_soft"],
            model_output["attn_logprob"], binarization_on, in_lens, out_lens,
            self.ctc_blank_logprob, self.binarization_loss_weight,
            self.ctc_loss_weight))
        return loss_dict


class AttributeRegressionLoss:
    def __init__(self, prefix: Optional[str] = None, weight=1.0):
        self.prefix = prefix or ""
        self.weight = weight

    def __call__(self, model_output, out_lens: Optional[SeqLens],
                 mask=None):
        if mask is None:
            mask = out_lens.mask[..., None]
        loss = masked_regression_loss(model_output["x_hat"],
                                      model_output["x"], mask)
        return {self.prefix + "loss": (loss, self.weight)}


class AttributeBCELoss:
    def __init__(self, prefix: Optional[str] = None, weight=1.0):
        self.prefix = prefix or ""
        self.weight = weight

    def __call__(self, model_output, out_lens: Optional[SeqLens],
                 mask=None):
        if mask is None:
            mask = out_lens.mask[..., None]
        loss = masked_bce_loss(model_output["x_hat"], model_output["x"],
                               mask)
        return {self.prefix + "loss": (loss, self.weight)}
