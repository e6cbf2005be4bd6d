"""HiFi-GAN vocoder training: GAN steps for generator + MPD/MSD.

The reference only *vendors* a vocoder training tree (the WaveGlow/Tacotron2
LIMMITS23 repo, SURVEY.md §2.6) and ships HiFi-GAN discriminators unused;
here vocoder training is a first-class jitted GAN loop:

* generator loss = adversarial (LSGAN) + 2x feature matching
  + 45 x mel-spectrogram L1 (standard HiFi-GAN recipe),
* discriminator loss = LSGAN real/fake on MPD (periods 2,3,5,7,11) and MSD
  (3 scales),
* AdamW (b1=0.8, b2=0.99) with exponential LR decay 0.999/epoch,
* random fixed-length audio segments with their aligned mel windows.
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from radmmm_tpu.ops.stft import MelSpectrogram
from radmmm_tpu.vocoder.hifigan import (Generator, HiFiGANConfig,
                                        MultiPeriodDiscriminator,
                                        MultiScaleDiscriminator,
                                        feature_loss, discriminator_loss,
                                        gaussian_blur_augment,
                                        gaussian_blur_kernels,
                                        generator_adv_loss)


@dataclasses.dataclass
class VocoderTrainConfig:
    segment_size: int = 8192
    learning_rate: float = 2e-4
    adam_b1: float = 0.8
    adam_b2: float = 0.99
    lr_decay: float = 0.999
    mel_loss_weight: float = 45.0
    feature_loss_weight: float = 2.0
    sampling_rate: int = 22050
    n_mel_channels: int = 80
    filter_length: int = 1024
    hop_length: int = 256
    win_length: int = 1024
    mel_fmax: Optional[float] = 8000.0
    mel_fmax_loss: Optional[float] = None   # full-band mel for the loss
    # Gaussian-blur input augmentation for GAN vocoder training
    # (GaussianBlurAugmentation, reference vocoders/hifigan_models.py:56-101;
    # enabled there via 'blur' checkpoints at p=0.5): with probability
    # blur_p the generator's input mel is blurred by a random-sigma 2-D
    # Gaussian, regularizing the discriminators against over-sharp mels.
    blur_p: float = 0.0
    blur_kernel_size: Tuple[int, int] = (5, 5)
    blur_sigmas: Tuple[float, ...] = (0.5, 1.0, 1.5, 2.0)
    seed: int = 0


@dataclasses.dataclass
class VocoderTrainState:
    step: jax.Array
    gen_params: Any
    mpd_params: Any
    msd_params: Any
    gen_opt: Any
    disc_opt: Any


jax.tree_util.register_dataclass(VocoderTrainState)


class HiFiGANTrainer:
    def __init__(self, gen_config: HiFiGANConfig,
                 cfg: VocoderTrainConfig = VocoderTrainConfig()):
        self.gen = Generator(config=gen_config)
        self.mpd = MultiPeriodDiscriminator()
        self.msd = MultiScaleDiscriminator()
        self.cfg = cfg
        self.mel_loss_fn = MelSpectrogram(
            cfg.filter_length, cfg.hop_length, cfg.win_length,
            cfg.n_mel_channels, cfg.sampling_rate, 0.0, cfg.mel_fmax_loss)
        self.gen_tx = optax.adamw(cfg.learning_rate, b1=cfg.adam_b1,
                                  b2=cfg.adam_b2)
        self.disc_tx = optax.adamw(cfg.learning_rate, b1=cfg.adam_b1,
                                   b2=cfg.adam_b2)
        self._blur_kernels = (gaussian_blur_kernels(cfg.blur_kernel_size,
                                                    cfg.blur_sigmas)
                              if cfg.blur_p > 0 else None)

    def init_state(self, rng, batch) -> VocoderTrainState:
        mel, audio = batch["mel"], batch["audio"]
        gen_vars = self.gen.init(rng, mel)
        fake = jnp.zeros_like(audio)
        mpd_vars = self.mpd.init(rng, audio, fake)
        msd_vars = self.msd.init(rng, audio, fake)
        return VocoderTrainState(
            step=jnp.zeros((), jnp.int32),
            gen_params=gen_vars["params"],
            mpd_params=mpd_vars["params"],
            msd_params=msd_vars["params"],
            gen_opt=self.gen_tx.init(gen_vars["params"]),
            disc_opt=self.disc_tx.init(
                {"mpd": mpd_vars["params"], "msd": msd_vars["params"]}),
        )

    @functools.partial(jax.jit, static_argnums=0, donate_argnums=1)
    def train_step(self, state: VocoderTrainState, batch):
        """One GAN step: discriminator update then generator update."""
        mel, audio = batch["mel"], batch["audio"]
        if self._blur_kernels is not None:
            # blur the GENERATOR's input once per step (the reference blurs
            # inside Generator.forward, reused for both D and G passes);
            # the mel-loss target mel_r stays the clean data mel
            key = jax.random.fold_in(jax.random.key(self.cfg.seed),
                                     state.step)
            mel = gaussian_blur_augment(mel, key, self._blur_kernels,
                                        self.cfg.blur_p)

        y_hat = self.gen.apply({"params": state.gen_params}, mel)
        y_hat_sg = jax.lax.stop_gradient(y_hat)

        # ---- discriminators ------------------------------------------
        def d_loss_fn(dparams):
            pr, pg, _, _ = self.mpd.apply({"params": dparams["mpd"]},
                                          audio, y_hat_sg)
            sr_, sg_, _, _ = self.msd.apply({"params": dparams["msd"]},
                                            audio, y_hat_sg)
            return discriminator_loss(pr, pg) + discriminator_loss(sr_, sg_)

        dparams = {"mpd": state.mpd_params, "msd": state.msd_params}
        d_loss, d_grads = jax.value_and_grad(d_loss_fn)(dparams)
        d_updates, disc_opt = self.disc_tx.update(d_grads, state.disc_opt,
                                                  dparams)
        dparams = optax.apply_updates(dparams, d_updates)

        # ---- generator ------------------------------------------------
        def g_loss_fn(gparams):
            y_g = self.gen.apply({"params": gparams}, mel)
            mel_g = self.mel_loss_fn(y_g)
            mel_r = self.mel_loss_fn(audio)
            loss_mel = jnp.mean(jnp.abs(mel_g - mel_r))
            pr, pg, fr, fg = self.mpd.apply({"params": dparams["mpd"]},
                                            audio, y_g)
            sr_, sg_, fr2, fg2 = self.msd.apply({"params": dparams["msd"]},
                                                audio, y_g)
            loss_adv = generator_adv_loss(pg) + generator_adv_loss(sg_)
            loss_fm = feature_loss(fr, fg) + feature_loss(fr2, fg2)
            total = (loss_adv
                     + self.cfg.feature_loss_weight / 2.0 * loss_fm
                     + self.cfg.mel_loss_weight * loss_mel)
            return total, {"gen_adv": loss_adv, "gen_fm": loss_fm,
                           "gen_mel": loss_mel}

        (g_loss, g_metrics), g_grads = jax.value_and_grad(
            g_loss_fn, has_aux=True)(state.gen_params)
        g_updates, gen_opt = self.gen_tx.update(g_grads, state.gen_opt,
                                                state.gen_params)
        gen_params = optax.apply_updates(state.gen_params, g_updates)

        new_state = VocoderTrainState(
            step=state.step + 1, gen_params=gen_params,
            mpd_params=dparams["mpd"], msd_params=dparams["msd"],
            gen_opt=gen_opt, disc_opt=disc_opt)
        metrics = {"disc_loss": d_loss, "gen_loss": g_loss, **g_metrics}
        return new_state, metrics


@dataclasses.dataclass
class WaveGlowTrainState:
    step: jax.Array
    params: Any
    opt_state: Any


jax.tree_util.register_dataclass(WaveGlowTrainState)


class WaveGlowTrainer:
    """Maximum-likelihood WaveGlow training (the capability the reference
    vendors as waveglow_for_LIMMITS23/train.py): flow NLL on random audio
    segments + aligned mel windows, Adam at 1e-4 (config.json train_config),
    same jitted-loop interface as HiFiGANTrainer."""

    def __init__(self, waveglow_config: Dict[str, Any],
                 cfg: VocoderTrainConfig = VocoderTrainConfig(),
                 sigma: float = 1.0):
        from radmmm_tpu.vocoder.waveglow import WaveGlow, waveglow_loss
        kw = dict(hop_length=cfg.hop_length,
                  n_mel_channels=cfg.n_mel_channels)
        kw.update(waveglow_config or {})
        self.model = WaveGlow(**kw)
        self.cfg = cfg
        self.sigma = sigma
        self._loss = waveglow_loss
        self.mel_loss_fn = MelSpectrogram(
            cfg.filter_length, cfg.hop_length, cfg.win_length,
            cfg.n_mel_channels, cfg.sampling_rate, 0.0, cfg.mel_fmax)
        self.tx = optax.adam(cfg.learning_rate)

    def init_state(self, rng, batch) -> WaveGlowTrainState:
        variables = self.model.init(rng, batch["audio"], batch["mel"])
        return WaveGlowTrainState(
            step=jnp.zeros((), jnp.int32),
            params=variables["params"],
            opt_state=self.tx.init(variables["params"]))

    @functools.partial(jax.jit, static_argnums=0, donate_argnums=1)
    def train_step(self, state: WaveGlowTrainState, batch):
        def loss_fn(params):
            out = self.model.apply({"params": params}, batch["audio"],
                                   batch["mel"])
            return self._loss(out, sigma=self.sigma)

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        updates, opt_state = self.tx.update(grads, state.opt_state,
                                            state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = WaveGlowTrainState(step=state.step + 1, params=params,
                                       opt_state=opt_state)
        return new_state, {"gen_loss": loss, "nll": loss}


def random_segments(audio: np.ndarray, audio_lens: np.ndarray,
                    mel_fn: MelSpectrogram, segment_size: int,
                    rng: np.random.Generator) -> Dict[str, jnp.ndarray]:
    """Random fixed-length audio crops + their mel windows (host-side)."""
    B = audio.shape[0]
    hop = mel_fn.hop_length
    segs = np.zeros((B, segment_size), np.float32)
    for b in range(B):
        max_start = max(int(audio_lens[b]) - segment_size, 0)
        start = int(rng.integers(0, max_start + 1)) if max_start > 0 else 0
        start = (start // hop) * hop
        chunk = audio[b, start:start + segment_size]
        segs[b, :len(chunk)] = chunk
    segs_j = jnp.asarray(segs)
    mel = mel_fn(segs_j)[:, :segment_size // hop]
    return {"audio": segs_j, "mel": mel}
