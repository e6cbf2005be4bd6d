"""HiFi-GAN vocoder: generator, discriminators, GAN losses, denoiser.

Reference: vocoders/hifigan_models.py:104-406 (generator with multi-
receptive-field fusion resblocks and transposed-conv upsampling; MPD/MSD
discriminators), hifigan_denoiser.py:25-59 (bias-spectrum subtraction).

TPU-native notes:
* channels-last layout; transposed convs via lhs-dilated conv_general
  (verified against torch ConvTranspose1d semantics in tests).
* the reference vocodes on CPU one item at a time
  (vocoder_utils.py:43, tts_lightning_modules.py:568-579 — and actually
  re-vocodes item 0 repeatedly, a known bug, SURVEY.md §2.9); here the
  generator is a batched jitted function on device.
* `load_torch_generator_params` converts upstream `g_*` checkpoints
  (weight-normed torch state dicts) into this module's params so existing
  pretrained vocoders can be used directly.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

LRELU_SLOPE = 0.1
_PREC = jax.lax.Precision.DEFAULT


@dataclasses.dataclass(frozen=True)
class HiFiGANConfig:
    """Mirrors the upstream generator config json (e.g. config_16khz.json)."""
    resblock: str = "1"
    upsample_rates: Tuple[int, ...] = (8, 8, 2, 2)
    upsample_kernel_sizes: Tuple[int, ...] = (16, 16, 4, 4)
    upsample_initial_channel: int = 512
    resblock_kernel_sizes: Tuple[int, ...] = (3, 7, 11)
    resblock_dilation_sizes: Tuple[Tuple[int, ...], ...] = (
        (1, 3, 5), (1, 3, 5), (1, 3, 5))
    n_mel_channels: int = 80
    sampling_rate: int = 22050
    # iSTFTNet-style synthesis head (arXiv:2203.02395): when gen_istft_n_fft
    # is set, the conv stack stops after `upsample_rates` and predicts
    # magnitude+phase frames that an inverse STFT (hop gen_istft_hop)
    # converts to audio — removing the FLOP-heavy low-channel upsample
    # stages at the longest lengths (e.g. C8C8I: rates (8,8), n_fft 16,
    # hop 4 for a 256-sample total hop)
    gen_istft_n_fft: Optional[int] = None
    gen_istft_hop: int = 4

    @property
    def hop_length(self) -> int:
        hop = int(np.prod(self.upsample_rates))
        if self.gen_istft_n_fft is not None:
            hop *= self.gen_istft_hop
        return hop


def _wn_conv_kernel(module, name, shape):
    """Weight-normed conv kernel (K, Cin, Cout), torch init N(0, 0.01)."""
    v = module.param(f"{name}_v", nn.initializers.normal(0.01), shape)
    g = module.param(
        f"{name}_g",
        lambda _, s: jnp.linalg.norm(
            v.transpose(2, 0, 1).reshape(shape[2], -1), axis=1),
        (shape[2],))
    norm = jnp.linalg.norm(v.transpose(2, 0, 1).reshape(shape[2], -1), axis=1)
    return v * (g / jnp.maximum(norm, 1e-12))[None, None, :]


def _wn_convT_kernel(module, name, shape):
    """Weight-normed ConvTranspose kernel (K, Cin, Cout).

    torch weight_norm(dim=0) on a (Cin, Cout, K) transposed-conv weight
    normalizes per *input* channel, so g has shape (Cin,)."""
    v = module.param(f"{name}_v", nn.initializers.normal(0.01), shape)
    g = module.param(
        f"{name}_g",
        lambda _, s: jnp.linalg.norm(
            v.transpose(1, 0, 2).reshape(shape[1], -1), axis=1),
        (shape[1],))
    norm = jnp.linalg.norm(v.transpose(1, 0, 2).reshape(shape[1], -1), axis=1)
    return v * (g / jnp.maximum(norm, 1e-12))[None, :, None]


def conv1d(x, kernel, bias=None, stride=1, dilation=1, padding=None):
    k = kernel.shape[0]
    if padding is None:
        padding = dilation * (k - 1) // 2
    y = jax.lax.conv_general_dilated(
        x, kernel, (stride,), [(padding, padding)], rhs_dilation=(dilation,),
        dimension_numbers=("NWC", "WIO", "NWC"), precision=_PREC)
    return y if bias is None else y + bias[None, None, :]


def conv_transpose1d(x, kernel, bias=None, stride=1, padding=0):
    """torch ConvTranspose1d equivalent via lhs-dilated conv.

    kernel: (K, Cin, Cout) (torch stores (Cin, Cout, K)); the underlying
    conv uses the spatially-flipped kernel."""
    k = kernel.shape[0]
    y = jax.lax.conv_general_dilated(
        x, jnp.flip(kernel, 0), (1,),
        [(k - 1 - padding, k - 1 - padding)], lhs_dilation=(stride,),
        dimension_numbers=("NWC", "WIO", "NWC"), precision=_PREC)
    return y if bias is None else y + bias[None, None, :]


def gaussian_blur_kernels(kernel_size: Tuple[int, int] = (5, 5),
                          sigmas: Tuple[float, ...] = (0.5, 1.0, 1.5, 2.0)):
    """Bank of normalized 2-D Gaussian kernels, (n_sigmas, k_mel, k_time).

    The separable product-of-1D-Gaussians construction of the reference's
    GaussianBlurAugmentation.initialize_kernels
    (vocoders/hifigan_models.py:65-86), built host-side once as a constant
    (the reference registers a buffer; here the bank is closed over by the
    jitted step)."""
    grids = np.meshgrid(*[np.arange(s, dtype=np.float32)
                          for s in kernel_size], indexing="ij")
    ks = []
    for sigma in sigmas:
        k = np.ones(kernel_size, np.float32)
        for size, g in zip(kernel_size, grids):
            mean = (size - 1) / 2
            k = k * np.exp(-((g - mean) / sigma) ** 2 / 2) \
                / (sigma * np.sqrt(2 * np.pi))
        ks.append(k / k.sum())
    return jnp.asarray(np.stack(ks))


def gaussian_blur_augment(mel, key, kernels, p_blurring: float):
    """Discriminator-training input augmentation: with probability
    ``p_blurring`` blur the (B, T, n_mel) mel with a kernel drawn uniformly
    from ``kernels`` (GaussianBlurAugmentation.forward,
    vocoders/hifigan_models.py:92-101; reflect padding, depthwise 2-D conv).

    TPU-shaped: the whole bank indexes with a traced draw and the
    apply/skip choice is a jnp.where — one compiled program, no
    data-dependent Python control flow."""
    kb, ki = jax.random.split(key)
    i = jax.random.randint(ki, (), 0, kernels.shape[0])
    # reference kernel dims are (mel, time) on a (B, 1, n_mel, T) image;
    # our layout is (B, T, n_mel) -> NHWC with H=time, W=mel
    k2d = jnp.transpose(kernels[i])[..., None, None]       # (k_t, k_m, 1, 1)
    pad_t = (kernels.shape[2] - 1) // 2
    pad_m = (kernels.shape[1] - 1) // 2
    x = jnp.pad(mel, ((0, 0), (pad_t, pad_t), (pad_m, pad_m)),
                mode="reflect")
    blurred = jax.lax.conv_general_dilated(
        x[..., None], k2d, (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))[..., 0]
    return jnp.where(jax.random.uniform(kb, ()) <= p_blurring, blurred, mel)


class ResBlock1(nn.Module):
    channels: int
    kernel_size: int = 3
    dilation: Tuple[int, ...] = (1, 3, 5)

    @nn.compact
    def __call__(self, x):
        for i, d in enumerate(self.dilation):
            shape = (self.kernel_size, self.channels, self.channels)
            k1 = _wn_conv_kernel(self, f"c1_{i}", shape)
            b1 = self.param(f"c1_{i}_bias", nn.initializers.zeros,
                            (self.channels,))
            k2 = _wn_conv_kernel(self, f"c2_{i}", shape)
            b2 = self.param(f"c2_{i}_bias", nn.initializers.zeros,
                            (self.channels,))
            xt = jax.nn.leaky_relu(x, LRELU_SLOPE)
            xt = conv1d(xt, k1, b1, dilation=d)
            xt = jax.nn.leaky_relu(xt, LRELU_SLOPE)
            xt = conv1d(xt, k2, b2, dilation=1)
            x = x + xt
        return x


class ResBlock2(nn.Module):
    channels: int
    kernel_size: int = 3
    dilation: Tuple[int, ...] = (1, 3)

    @nn.compact
    def __call__(self, x):
        for i, d in enumerate(self.dilation):
            shape = (self.kernel_size, self.channels, self.channels)
            k = _wn_conv_kernel(self, f"c_{i}", shape)
            b = self.param(f"c_{i}_bias", nn.initializers.zeros,
                           (self.channels,))
            xt = jax.nn.leaky_relu(x, LRELU_SLOPE)
            x = x + conv1d(xt, k, b, dilation=d)
        return x


class Generator(nn.Module):
    """mel (B, T, 80) -> waveform (B, T*hop) in [-1, 1]."""
    config: HiFiGANConfig

    @nn.compact
    def __call__(self, mel):
        h = self.config
        x = mel
        k = _wn_conv_kernel(self, "conv_pre",
                            (7, h.n_mel_channels, h.upsample_initial_channel))
        b = self.param("conv_pre_bias", nn.initializers.zeros,
                       (h.upsample_initial_channel,))
        x = conv1d(x, k, b)
        Res = ResBlock1 if h.resblock == "1" else ResBlock2
        ch = h.upsample_initial_channel
        for i, (u, ks) in enumerate(zip(h.upsample_rates,
                                        h.upsample_kernel_sizes)):
            x = jax.nn.leaky_relu(x, LRELU_SLOPE)
            out_ch = h.upsample_initial_channel // (2 ** (i + 1))
            ku = _wn_convT_kernel(self, f"up_{i}", (ks, ch, out_ch))
            bu = self.param(f"up_{i}_bias", nn.initializers.zeros, (out_ch,))
            x = conv_transpose1d(x, ku, bu, stride=u, padding=(ks - u) // 2)
            ch = out_ch
            xs = jnp.zeros_like(x)
            for j, (rk, rd) in enumerate(zip(h.resblock_kernel_sizes,
                                             h.resblock_dilation_sizes)):
                xs = xs + Res(ch, rk, tuple(rd),
                              name=f"resblock_{i}_{j}")(x)
            x = xs / len(h.resblock_kernel_sizes)
        x = jax.nn.leaky_relu(x, 0.01)  # final lrelu uses default slope
        if h.gen_istft_n_fft is not None:
            # iSTFTNet head: predict per-frame magnitude+phase, synthesize
            # with an inverse STFT (arXiv:2203.02395 §2; our TPU-safe
            # complex-free istft does the overlap-add)
            from radmmm_tpu.ops.stft import istft_frames
            n_fft, ihop = h.gen_istft_n_fft, h.gen_istft_hop
            K = n_fft // 2 + 1
            kp = _wn_conv_kernel(self, "conv_post", (7, ch, 2 * K))
            bp = self.param("conv_post_bias", nn.initializers.zeros,
                            (2 * K,))
            x = conv1d(x, kp, bp)
            # f32 synthesis: FFT/complex ops don't take bf16, and the
            # iSTFT is a negligible share of the FLOPs
            xf = x.astype(jnp.float32)
            mag = jnp.exp(jnp.clip(xf[..., :K], -8.0, 8.0))
            phase = xf[..., K:]
            window = jnp.hanning(n_fft).astype(jnp.float32)
            audio = istft_frames(mag, phase, n_fft, ihop, window)
            # istft center-trim loses (n_fft - ihop) samples; pad split
            # evenly so callers get exactly T_frames * hop_length samples
            want = mel.shape[1] * h.hop_length
            missing = want - audio.shape[1]
            lo = max(0, missing // 2)
            hi = max(0, missing - lo)
            return jnp.pad(audio, ((0, 0), (lo, hi)))[:, :want]
        kp = _wn_conv_kernel(self, "conv_post", (7, ch, 1))
        bp = self.param("conv_post_bias", nn.initializers.zeros, (1,))
        x = conv1d(x, kp, bp)
        return jnp.tanh(x)[..., 0]


# ---------------------------------------------------------------------------
# discriminators (for vocoder training; periods per hifigan_models.py:409)
# ---------------------------------------------------------------------------
class DiscriminatorP(nn.Module):
    period: int
    kernel_size: int = 5
    stride: int = 3

    @nn.compact
    def __call__(self, x):
        """x: (B, T) -> (score (B, N), fmaps list)."""
        B, T = x.shape
        pad = (self.period - T % self.period) % self.period
        x = jnp.pad(x, ((0, 0), (0, pad)), mode="reflect")
        x = x.reshape(B, -1, self.period, 1)   # (B, T/p, p, 1) NHWC
        fmap = []
        chs = [32, 128, 512, 1024]
        cin = 1
        for i, ch in enumerate(chs):
            k = self.param(f"conv_{i}_v", nn.initializers.normal(0.01),
                           (self.kernel_size, 1, cin, ch))
            g = self.param(f"conv_{i}_g",
                           lambda _, s: jnp.ones(s), (ch,))
            norm = jnp.linalg.norm(k.reshape(-1, ch), axis=0)
            kern = k * (g / jnp.maximum(norm, 1e-12))
            b = self.param(f"conv_{i}_bias", nn.initializers.zeros, (ch,))
            x = jax.lax.conv_general_dilated(
                x, kern, (self.stride, 1), [(2, 2), (0, 0)],
                dimension_numbers=("NHWC", "HWIO", "NHWC")) + b
            x = jax.nn.leaky_relu(x, LRELU_SLOPE)
            fmap.append(x)
            cin = ch
        k = self.param("conv_out_v", nn.initializers.normal(0.01),
                       (3, 1, cin, 1))
        b = self.param("conv_out_bias", nn.initializers.zeros, (1,))
        x = jax.lax.conv_general_dilated(
            x, k, (1, 1), [(1, 1), (0, 0)],
            dimension_numbers=("NHWC", "HWIO", "NHWC")) + b
        fmap.append(x)
        return x.reshape(B, -1), fmap


class DiscriminatorS(nn.Module):
    """Scale discriminator over (possibly pooled) raw audio."""

    @nn.compact
    def __call__(self, x):
        x = x[..., None]   # (B, T, 1)
        fmap = []
        layer_cfg = [  # (out, k, stride, groups)
            (128, 15, 1, 1), (128, 41, 2, 4), (256, 41, 2, 16),
            (512, 41, 4, 16), (1024, 41, 4, 16), (1024, 41, 1, 16),
            (1024, 5, 1, 1)]
        cin = 1
        for i, (ch, k, s, grp) in enumerate(layer_cfg):
            kern = self.param(f"conv_{i}_kernel",
                              nn.initializers.normal(0.01),
                              (k, cin // grp, ch))
            b = self.param(f"conv_{i}_bias", nn.initializers.zeros, (ch,))
            x = jax.lax.conv_general_dilated(
                x, kern, (s,), [((k - 1) // 2, (k - 1) // 2)],
                feature_group_count=grp,
                dimension_numbers=("NWC", "WIO", "NWC")) + b
            x = jax.nn.leaky_relu(x, LRELU_SLOPE)
            fmap.append(x)
            cin = ch
        kern = self.param("conv_out_kernel", nn.initializers.normal(0.01),
                          (3, cin, 1))
        b = self.param("conv_out_bias", nn.initializers.zeros, (1,))
        x = conv1d(x, kern, b)
        fmap.append(x)
        return x[..., 0], fmap


class MultiPeriodDiscriminator(nn.Module):
    periods: Sequence[int] = (2, 3, 5, 7, 11)

    @nn.compact
    def __call__(self, y, y_hat):
        outs_r, outs_g, fmaps_r, fmaps_g = [], [], [], []
        for p in self.periods:
            d = DiscriminatorP(p, name=f"period_{p}")
            sr, fr = d(y)
            sg, fg = d(y_hat)
            outs_r.append(sr); outs_g.append(sg)
            fmaps_r.append(fr); fmaps_g.append(fg)
        return outs_r, outs_g, fmaps_r, fmaps_g


class MultiScaleDiscriminator(nn.Module):
    n_scales: int = 3

    @nn.compact
    def __call__(self, y, y_hat):
        outs_r, outs_g, fmaps_r, fmaps_g = [], [], [], []
        for i in range(self.n_scales):
            d = DiscriminatorS(name=f"scale_{i}")
            sr, fr = d(y)
            sg, fg = d(y_hat)
            outs_r.append(sr); outs_g.append(sg)
            fmaps_r.append(fr); fmaps_g.append(fg)
            if i < self.n_scales - 1:
                y = jax.lax.reduce_window(
                    y, 0.0, jax.lax.add, (1, 4), (1, 2), "SAME") / 4.0
                y_hat = jax.lax.reduce_window(
                    y_hat, 0.0, jax.lax.add, (1, 4), (1, 2), "SAME") / 4.0
        return outs_r, outs_g, fmaps_r, fmaps_g


# ---- GAN losses (hifigan_models.py:349-406, least-squares form) ----------
def feature_loss(fmaps_r, fmaps_g):
    loss = 0.0
    for fr, fg in zip(fmaps_r, fmaps_g):
        for r, g in zip(fr, fg):
            loss += jnp.mean(jnp.abs(r - g))
    return loss * 2.0


def discriminator_loss(outs_r, outs_g):
    loss = 0.0
    for dr, dg in zip(outs_r, outs_g):
        loss += jnp.mean((1 - dr) ** 2) + jnp.mean(dg ** 2)
    return loss


def generator_adv_loss(outs_g):
    return sum(jnp.mean((1 - dg) ** 2) for dg in outs_g)


# ---- denoiser -------------------------------------------------------------
class Denoiser:
    """Subtracts the vocoder's bias spectrum (hifigan_denoiser.py:25-59)."""

    def __init__(self, generator_apply, gen_variables,
                 n_mel_channels=80, filter_length=1024, n_overlap=4,
                 win_length=1024):
        from radmmm_tpu.ops.stft import MelSpectrogram
        self.stft = MelSpectrogram(filter_length=filter_length,
                                   hop_length=filter_length // n_overlap,
                                   win_length=win_length)
        bias_mel = jnp.zeros((1, 88, n_mel_channels))
        bias_audio = generator_apply(gen_variables, bias_mel)
        spec = self.stft.stft(bias_audio)
        self.bias_spec = jnp.abs(spec)[:, :1, :]   # first frame

    def __call__(self, audio, strength=0.1):
        spec = self.stft.stft(audio)
        mag, phase = jnp.abs(spec), jnp.angle(spec)
        mag = jnp.maximum(mag - self.bias_spec * strength, 0.0)
        return self.stft.istft(mag, phase)


# ---- upstream checkpoint conversion --------------------------------------
def load_torch_generator_params(state_dict: Dict[str, Any],
                                config: HiFiGANConfig):
    """Convert an upstream HiFi-GAN `g_*` state dict (torch, weight-normed)
    to this Generator's params. Accepts numpy arrays or torch tensors."""
    def npy(t):
        return np.asarray(t.detach().cpu().numpy()
                          if hasattr(t, "detach") else t)

    def conv_v(key):      # torch (Cout, Cin, K) -> (K, Cin, Cout)
        return npy(state_dict[key]).transpose(2, 1, 0)

    def convT_v(key):     # torch ConvTranspose (Cin, Cout, K) -> (K, Cin, Cout)
        return npy(state_dict[key]).transpose(2, 0, 1)

    p: Dict[str, Any] = {}
    p["conv_pre_v"] = conv_v("conv_pre.weight_v")
    p["conv_pre_g"] = npy(state_dict["conv_pre.weight_g"]).reshape(-1)
    p["conv_pre_bias"] = npy(state_dict["conv_pre.bias"])
    p["conv_post_v"] = conv_v("conv_post.weight_v")
    p["conv_post_g"] = npy(state_dict["conv_post.weight_g"]).reshape(-1)
    p["conv_post_bias"] = npy(state_dict["conv_post.bias"])
    for i in range(len(config.upsample_rates)):
        p[f"up_{i}_v"] = convT_v(f"ups.{i}.weight_v")
        p[f"up_{i}_g"] = npy(state_dict[f"ups.{i}.weight_g"]).reshape(-1)
        p[f"up_{i}_bias"] = npy(state_dict[f"ups.{i}.bias"])
        for j in range(len(config.resblock_kernel_sizes)):
            blk: Dict[str, Any] = {}
            for li in range(len(config.resblock_dilation_sizes[j])):
                for cname, ours in (("convs1", "c1"), ("convs2", "c2")):
                    base = f"resblocks.{i}.{j}.{cname}.{li}"
                    blk[f"{ours}_{li}_v"] = conv_v(f"{base}.weight_v")
                    blk[f"{ours}_{li}_g"] = npy(
                        state_dict[f"{base}.weight_g"]).reshape(-1)
                    blk[f"{ours}_{li}_bias"] = npy(
                        state_dict[f"{base}.bias"])
            p[f"resblock_{i}_{j}"] = blk
    return {"params": p}
