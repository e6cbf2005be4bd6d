"""Vocoder loading/dispatch + mel->audio helpers.

Equivalent of vocoders/vocoder_utils.py:35-143 (get_vocoder /
get_audio_for_mels) with two fixes over the reference:
* vocoding is batched and jitted on device (the reference vocodes on CPU and
  accidentally re-vocodes item 0 for every item, vocoder_utils.py:43 +
  tts_lightning_modules.py:568-579 — SURVEY.md §2.9);
* a griffin-lim fallback synthesizes audio when no vocoder checkpoint is
  configured (uses the pseudo-inverse mel basis).
"""
from __future__ import annotations

import functools
import json
import os
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from radmmm_tpu.ops.stft import (MelSpectrogram, mel_filterbank,
                                 dynamic_range_decompression, griffin_lim)
from radmmm_tpu.vocoder.hifigan import (HiFiGANConfig, Generator, Denoiser,
                                        load_torch_generator_params)


def load_hifigan_config(config_path: str) -> HiFiGANConfig:
    with open(config_path) as f:
        h = json.load(f)
    return HiFiGANConfig(
        resblock=str(h.get("resblock", "1")),
        upsample_rates=tuple(h["upsample_rates"]),
        upsample_kernel_sizes=tuple(h["upsample_kernel_sizes"]),
        upsample_initial_channel=h["upsample_initial_channel"],
        resblock_kernel_sizes=tuple(h["resblock_kernel_sizes"]),
        resblock_dilation_sizes=tuple(
            tuple(d) for d in h["resblock_dilation_sizes"]),
        n_mel_channels=h.get("num_mels", 80),
        sampling_rate=h.get("sampling_rate", 22050),
    )


def _load_native_vocoder(vocoder_type: str, run_dir: str,
                         vocoder_config_path, with_denoiser: bool):
    """Load a `vocoder-fit` output directory (or its `ckpt` subdir): orbax
    state + the generator_config.json the loop writes next to it."""
    import orbax.checkpoint as ocp

    run_dir = os.path.abspath(str(run_dir))
    ckpt_dir = (run_dir if os.path.basename(run_dir) == "ckpt"
                or not os.path.isdir(os.path.join(run_dir, "ckpt"))
                else os.path.join(run_dir, "ckpt"))
    cfg_path = (vocoder_config_path
                if vocoder_config_path
                and str(vocoder_config_path).endswith(".json")
                and os.path.exists(str(vocoder_config_path))
                else os.path.join(os.path.dirname(ckpt_dir),
                                  "generator_config.json"))
    gen_kwargs = {}
    if os.path.exists(cfg_path):
        with open(cfg_path) as f:
            gen_kwargs = {k: tuple(tuple(x) if isinstance(x, list) else x
                                   for x in v)
                          if isinstance(v, list) else v
                          for k, v in json.load(f).items()}
    if vocoder_type != "hifigan":
        raise ValueError("native checkpoint loading is implemented for "
                         "hifigan runs (vocoder-fit default)")
    mgr = ocp.CheckpointManager(ckpt_dir)
    step = mgr.latest_step()
    if step is None:
        raise FileNotFoundError(f"no checkpoints under {ckpt_dir}")
    payload = mgr.restore(step)
    gen_params = payload["gen_params"]
    cfg = HiFiGANConfig(**gen_kwargs)
    gen = Generator(config=cfg)
    variables = {"params": gen_params}
    apply = jax.jit(gen.apply)

    def generator_fn(mel):
        return apply(variables, mel)

    denoiser = (Denoiser(gen.apply, variables,
                         n_mel_channels=cfg.n_mel_channels)
                if with_denoiser else None)
    return generator_fn, denoiser


def load_hifigan_module(vocoder_config_path, ckpt_or_path):
    """(Generator module, converted variables) from an upstream torch
    checkpoint — the module+params form needed to bake the vocoder into an
    exported serving artifact (radmmm_tpu/serving.py)."""
    if isinstance(ckpt_or_path, (str, os.PathLike)):
        import torch
        ckpt_or_path = torch.load(ckpt_or_path, map_location="cpu",
                                  weights_only=False)
    cfg = (load_hifigan_config(vocoder_config_path)
           if vocoder_config_path and os.path.exists(str(vocoder_config_path))
           else HiFiGANConfig())
    state_dict = ckpt_or_path.get("generator", ckpt_or_path)
    variables = load_torch_generator_params(state_dict, cfg)
    return Generator(config=cfg), variables


def get_vocoder(vocoder_type: str = "hifigan",
                vocoder_config_path: Optional[str] = None,
                vocoder_checkpoint_path: Optional[str] = None,
                vocoder_map=None, with_denoiser: bool = True):
    """-> (generator_fn(mel (B,T,80)) -> (B, T*hop), denoiser or None).

    Dispatches hifigan and waveglow like the reference
    (vocoder_utils.py:35-132); loads upstream torch checkpoints (`g_*`
    HiFi-GAN state dicts, LIMMITS23 WaveGlow `model` checkpoints) through
    the state-dict converters. Returns (None, None) when unconfigured
    (caller falls back to griffin-lim).
    """
    if vocoder_type not in ("hifigan", "waveglow"):
        raise ValueError(f"unsupported vocoder type {vocoder_type}")
    if not vocoder_checkpoint_path or not os.path.exists(
            str(vocoder_checkpoint_path)):
        return None, None
    if os.path.isdir(str(vocoder_checkpoint_path)):
        # native checkpoint from `vocoder-fit` (orbax run dir)
        return _load_native_vocoder(vocoder_type, vocoder_checkpoint_path,
                                    vocoder_config_path, with_denoiser)
    import torch
    ckpt = torch.load(vocoder_checkpoint_path, map_location="cpu",
                      weights_only=False)

    if vocoder_type == "waveglow":
        from radmmm_tpu.vocoder.waveglow import (WaveGlow,
                                                 load_waveglow_config,
                                                 load_torch_waveglow_params)
        state_dict = ckpt.get("model", ckpt)
        if hasattr(state_dict, "state_dict"):   # full pickled nn.Module
            state_dict = state_dict.state_dict()
        wg = WaveGlow(**load_waveglow_config(
            vocoder_config_path if vocoder_config_path
            and os.path.exists(str(vocoder_config_path)) else None))
        variables = load_torch_waveglow_params(state_dict, wg)
        infer = jax.jit(functools.partial(wg.apply, method=WaveGlow.infer),
                        static_argnames=("sigma",))

        def generator_fn(mel, sigma: float = 0.667, rng=None):
            # sigma 0.667: the reference's default (vocoder_utils.py:38)
            rng = rng if rng is not None else jax.random.key(0)
            return infer(variables, rng, mel, sigma=sigma)

        denoiser = (Denoiser(lambda _, mel: generator_fn(mel, sigma=0.0),
                             None, n_mel_channels=wg.n_mel_channels)
                    if with_denoiser else None)
        return generator_fn, denoiser

    gen, variables = load_hifigan_module(vocoder_config_path, ckpt)
    cfg = gen.config
    apply = jax.jit(gen.apply)

    def generator_fn(mel):
        return apply(variables, mel)

    denoiser = (Denoiser(gen.apply, variables,
                         n_mel_channels=cfg.n_mel_channels)
                if with_denoiser else None)
    return generator_fn, denoiser


def get_vocoder_map(vocoder_map: Dict[str, Dict[str, str]]):
    """Per-speaker vocoder dispatch (vocoder_utils.py vocoder_map):
    {speaker: {vocoder_config_path, vocoder_checkpoint_path}} ->
    {speaker: (generator_fn, denoiser)}."""
    out = {}
    for speaker, cfg in (vocoder_map or {}).items():
        out[speaker] = get_vocoder(
            cfg.get("vocoder_type", "hifigan"),
            cfg.get("vocoder_config_path"),
            cfg.get("vocoder_checkpoint_path"))
    return out


class GriffinLimVocoder:
    """mel (B, T, n_mels) log-mel -> waveform via pinv(mel basis) + GL."""

    def __init__(self, filter_length=1024, hop_length=256, win_length=1024,
                 n_mel_channels=80, sampling_rate=22050, mel_fmin=0.0,
                 mel_fmax=8000.0, n_iters=30):
        self.stft = MelSpectrogram(filter_length, hop_length, win_length,
                                   n_mel_channels, sampling_rate, mel_fmin,
                                   mel_fmax)
        basis = mel_filterbank(sampling_rate, filter_length, n_mel_channels,
                               mel_fmin, mel_fmax)
        self.inv_basis = jnp.asarray(np.linalg.pinv(basis))
        self.n_iters = n_iters

    def __call__(self, mel: jax.Array, rng=None) -> jax.Array:
        rng = rng if rng is not None else jax.random.key(0)
        mag = dynamic_range_decompression(mel) @ self.inv_basis.T
        mag = jnp.maximum(mag, 0.0)
        return griffin_lim(mag, self.stft, rng, self.n_iters)


def get_audio_for_mels(mels: jax.Array, vocoder_type: str, vocoder_fn,
                       denoiser: Optional[Denoiser] = None,
                       denoiser_strength: float = 0.005) -> jax.Array:
    """Batched mel -> denoised audio (vocoder_utils.py:64-132)."""
    audio = vocoder_fn(mels)
    if denoiser is not None:
        audio = denoiser(audio, strength=denoiser_strength)
    return audio
