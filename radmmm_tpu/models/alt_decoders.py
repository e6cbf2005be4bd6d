"""Alternative decoder regimes: deterministic regression and DDPM diffusion.

The reference carries these alongside the flow decoder (the
WaveNetOriginal diffusion parameter predictor with step embeddings,
common.py:838-921, and the deterministic/diffusion loss regimes,
loss.py:351-406); shipped configs don't train them, but they are part of
the framework surface. Both reuse the RADMMM context-preprocessing
contract: conditioning = attention-aligned text + speaker (+F0/energy).

* DeterministicDecoder — context -> conv stack -> mel, trained with the
  masked L1 mel loss (RADTTSDeterministicLoss).
* DiffusionDecoder    — epsilon-prediction DDPM over mel frames with a
  sinusoidal step embedding feeding a gated WaveNet (the WaveNetOriginal
  design); training draws (t, eps) per item, inference runs ancestral
  sampling with lax.scan.
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from radmmm_tpu.ops.conv import MaskedConv1d
from radmmm_tpu.utils.masking import SeqLens


class StepEmbedding(nn.Module):
    """Sinusoidal diffusion-step embedding -> 2-layer MLP."""
    dim: int = 128

    @nn.compact
    def __call__(self, t: jax.Array) -> jax.Array:
        half = self.dim // 2
        freqs = jnp.exp(-np.log(10000.0) * jnp.arange(half) / half)
        ang = t.astype(jnp.float32)[:, None] * freqs[None, :]
        emb = jnp.concatenate([jnp.sin(ang), jnp.cos(ang)], axis=-1)
        emb = jax.nn.silu(nn.Dense(self.dim)(emb))
        return nn.Dense(self.dim)(emb)


class DiffusionWaveNet(nn.Module):
    """Step-conditioned gated WaveNet (WaveNetOriginal, common.py:838-921).

    acts = tanh/sigmoid gate of z_proj + step_proj * context_proj;
    residual z = 0.5(z + res_skip); output accumulates 0.5(out + res_skip).
    """
    n_in_channels: int
    n_context_dim: int
    n_layers: int = 4
    n_channels: int = 256
    kernel_size: int = 5

    @nn.compact
    def __call__(self, z, cond, step_emb, mask=None):
        h = MaskedConv1d(self.n_channels, 1, use_weight_norm=True,
                         use_partial_padding=True, name="start")(z, mask)
        output = jnp.zeros_like(h)
        T = z.shape[1]
        step_t = jnp.broadcast_to(step_emb[:, None, :],
                                  (z.shape[0], T, step_emb.shape[-1]))
        for i in range(self.n_layers):
            dilation = 2 ** i
            z_proj = MaskedConv1d(2 * self.n_channels, self.kernel_size,
                                  dilation=dilation, use_weight_norm=True,
                                  use_partial_padding=True,
                                  name=f"in_{i}")(h, mask)
            c_proj = MaskedConv1d(2 * self.n_channels, self.kernel_size,
                                  dilation=dilation, use_weight_norm=True,
                                  use_partial_padding=True,
                                  name=f"cond_{i}")(cond, mask)
            s_proj = MaskedConv1d(2 * self.n_channels, self.kernel_size,
                                  dilation=dilation, use_weight_norm=True,
                                  use_partial_padding=True,
                                  name=f"step_{i}")(step_t, mask)
            acts = z_proj + s_proj * c_proj
            gated = (jnp.tanh(acts[..., :self.n_channels])
                     * jax.nn.sigmoid(acts[..., self.n_channels:]))
            res_skip = MaskedConv1d(self.n_channels, 1,
                                    use_weight_norm=True,
                                    use_partial_padding=True,
                                    name=f"res_skip_{i}")(gated, mask)
            if i < self.n_layers - 1:
                h = 0.5 * (h + res_skip)
            output = 0.5 * (output + res_skip)
        return MaskedConv1d(self.n_in_channels, 1, use_weight_norm=True,
                            use_partial_padding=True,
                            name="end")(output, mask)


class DeterministicDecoder(nn.Module):
    """context (B,T,C_ctx) [+spk/f0/energy channels] -> mel (B,T,n_mel)."""
    n_mel_channels: int = 80
    n_speaker_dim: int = 16
    n_layers: int = 4
    n_channels: int = 512
    kernel_size: int = 5

    @nn.compact
    def __call__(self, context, spk_vecs, lens: SeqLens, f0=None,
                 energy_avg=None, train: bool = True):
        T = context.shape[1]
        parts = [context, jnp.broadcast_to(
            spk_vecs[:, None, :], (context.shape[0], T,
                                   spk_vecs.shape[-1]))]
        if f0 is not None:
            parts.append(f0[..., None])
        if energy_avg is not None:
            parts.append(energy_avg[..., None])
        h = jnp.concatenate(parts, axis=-1)
        for i in range(self.n_layers):
            h = MaskedConv1d(self.n_channels, self.kernel_size,
                             w_init_gain="relu", use_partial_padding=True,
                             use_weight_norm=True,
                             name=f"conv_{i}")(h, lens.mask)
            h = jax.nn.relu(h)
        mel_hat = MaskedConv1d(self.n_mel_channels, 1,
                               name="out")(h, lens.mask)
        return {"mel_hat": mel_hat}


class E2ETTSDecoder(nn.Module):
    """End-to-end waveform regime: deterministic mel decoder feeding a
    HiFi-GAN generator, trained with the multi-res STFT (+GAN) losses
    (RADTTSE2EGANLoss, loss.py:408-497). The reference keeps this path
    dormant; here it is a working module."""
    n_mel_channels: int = 80
    n_speaker_dim: int = 16
    n_layers: int = 4
    n_channels: int = 512
    vocoder_config: Optional[object] = None   # HiFiGANConfig

    def setup(self):
        from radmmm_tpu.vocoder.hifigan import Generator, HiFiGANConfig
        self.mel_decoder = DeterministicDecoder(
            self.n_mel_channels, self.n_speaker_dim, self.n_layers,
            self.n_channels)
        cfg = self.vocoder_config or HiFiGANConfig(
            n_mel_channels=self.n_mel_channels)
        self.generator = Generator(config=cfg)

    def __call__(self, context, spk_vecs, lens: SeqLens, f0=None,
                 energy_avg=None, train: bool = True):
        out = self.mel_decoder(context, spk_vecs, lens, f0, energy_avg,
                               train=train)
        audio_hat = self.generator(out["mel_hat"])
        return {"mel_hat": out["mel_hat"], "audio_hat": audio_hat}


@dataclasses.dataclass(frozen=True)
class DiffusionSchedule:
    n_steps: int = 100
    beta_start: float = 1e-4
    beta_end: float = 0.05

    def betas(self):
        return np.linspace(self.beta_start, self.beta_end, self.n_steps,
                           dtype=np.float32)

    def alpha_bars(self):
        return np.cumprod(1.0 - self.betas())


class DiffusionDecoder(nn.Module):
    """Epsilon-prediction DDPM over mel frames, context-conditioned."""
    n_mel_channels: int = 80
    n_context_dim: int = 512
    n_layers: int = 4
    n_channels: int = 256
    schedule: DiffusionSchedule = DiffusionSchedule()

    def setup(self):
        self.step_embedding = StepEmbedding(128)
        self.net = DiffusionWaveNet(self.n_mel_channels, self.n_context_dim,
                                    self.n_layers, self.n_channels)

    def predict_noise(self, noisy_mel, context, t, mask=None):
        return self.net(noisy_mel, context, self.step_embedding(t), mask)

    def __call__(self, rng, mel, context, lens: SeqLens):
        """Training: sample t + noise, predict it. Returns
        {'noise','noise_hat'} for RADTTSDiffusionLoss."""
        B = mel.shape[0]
        rng_t, rng_n = jax.random.split(rng)
        t = jax.random.randint(rng_t, (B,), 0, self.schedule.n_steps)
        noise = jax.random.normal(rng_n, mel.shape)
        abar = jnp.asarray(self.schedule.alpha_bars())[t][:, None, None]
        noisy = jnp.sqrt(abar) * mel + jnp.sqrt(1.0 - abar) * noise
        noise_hat = self.predict_noise(noisy, context, t, lens.mask)
        return {"noise": noise, "noise_hat": noise_hat}

    def infer(self, rng, context, lens: SeqLens):
        """Ancestral DDPM sampling, lax.scan over reversed steps."""
        B, T = context.shape[0], context.shape[1]
        betas = jnp.asarray(self.schedule.betas())
        alphas = 1.0 - betas
        abars = jnp.asarray(self.schedule.alpha_bars())
        x = jax.random.normal(rng, (B, T, self.n_mel_channels))

        def body(x, inp):
            t, key = inp
            tb = jnp.full((B,), t, jnp.int32)
            eps = self.predict_noise(x, context, tb, lens.mask)
            a, ab, b = alphas[t], abars[t], betas[t]
            mean = (x - b / jnp.sqrt(1.0 - ab) * eps) / jnp.sqrt(a)
            z = jax.random.normal(key, x.shape)
            x = mean + jnp.where(t > 0, jnp.sqrt(b), 0.0) * z
            return x, None

        keys = jax.random.split(jax.random.fold_in(rng, 1),
                                self.schedule.n_steps)
        ts = jnp.arange(self.schedule.n_steps - 1, -1, -1)
        x, _ = jax.lax.scan(body, x, (ts, keys))
        return x * lens.fmask(x.dtype)[..., None]
