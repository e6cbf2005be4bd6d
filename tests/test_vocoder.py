"""HiFi-GAN: conv-transpose parity, generator vs torch oracle, denoiser."""
import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F

from radmmm_tpu.vocoder.hifigan import (
    HiFiGANConfig, Generator, conv_transpose1d,
    MultiPeriodDiscriminator, MultiScaleDiscriminator,
    feature_loss, discriminator_loss, generator_adv_loss,
    load_torch_generator_params, Denoiser)


def test_conv_transpose_matches_torch(rng):
    B, T, Cin, Cout, K, S = 2, 10, 6, 4, 16, 8
    x = rng.standard_normal((B, T, Cin)).astype(np.float32)
    w = (rng.standard_normal((Cin, Cout, K)) * 0.1).astype(np.float32)
    b = rng.standard_normal((Cout,)).astype(np.float32)
    pad = (K - S) // 2
    mod = nn.ConvTranspose1d(Cin, Cout, K, S, padding=pad)
    with torch.no_grad():
        mod.weight.copy_(torch.from_numpy(w))
        mod.bias.copy_(torch.from_numpy(b))
    want = mod(torch.from_numpy(x.transpose(0, 2, 1))).detach().numpy()
    got = np.asarray(conv_transpose1d(
        jnp.asarray(x), jnp.asarray(w.transpose(2, 0, 1)), jnp.asarray(b),
        stride=S, padding=pad))
    np.testing.assert_allclose(got, want.transpose(0, 2, 1), atol=1e-4)
    assert got.shape == (B, T * S, Cout)


class TorchMiniGen(nn.Module):
    """Upstream-architecture oracle (1 upsample, 2 resblock kernels)."""

    def __init__(self, cfg):
        super().__init__()
        wn = nn.utils.weight_norm
        self.conv_pre = wn(nn.Conv1d(cfg.n_mel_channels,
                                     cfg.upsample_initial_channel, 7, 1,
                                     padding=3))
        self.ups = nn.ModuleList()
        ch = cfg.upsample_initial_channel
        for i, (u, k) in enumerate(zip(cfg.upsample_rates,
                                       cfg.upsample_kernel_sizes)):
            self.ups.append(wn(nn.ConvTranspose1d(
                ch // (2 ** i), ch // (2 ** (i + 1)), k, u,
                padding=(k - u) // 2)))
        self.resblocks = nn.ModuleList()
        for i in range(len(cfg.upsample_rates)):
            group = nn.ModuleList()
            cch = ch // (2 ** (i + 1))
            for k, ds in zip(cfg.resblock_kernel_sizes,
                             cfg.resblock_dilation_sizes):
                convs1 = nn.ModuleList([
                    wn(nn.Conv1d(cch, cch, k, dilation=d,
                                 padding=d * (k - 1) // 2)) for d in ds])
                convs2 = nn.ModuleList([
                    wn(nn.Conv1d(cch, cch, k, padding=(k - 1) // 2))
                    for _ in ds])
                blk = nn.Module()
                blk.convs1, blk.convs2 = convs1, convs2
                group.append(blk)
            self.resblocks.append(group)
        self.conv_post = wn(nn.Conv1d(cch, 1, 7, 1, padding=3))

    def forward(self, x):
        x = self.conv_pre(x)
        for up, group in zip(self.ups, self.resblocks):
            x = F.leaky_relu(x, 0.1)
            x = up(x)
            xs = torch.zeros_like(x)
            for blk in group:
                h = x
                for c1, c2 in zip(blk.convs1, blk.convs2):
                    t = F.leaky_relu(h, 0.1)
                    t = c1(t)
                    t = F.leaky_relu(t, 0.1)
                    t = c2(t)
                    h = h + t
                xs += h
            x = xs / len(group)
        x = F.leaky_relu(x)
        x = self.conv_post(x)
        return torch.tanh(x)


def test_generator_matches_torch_oracle(rng):
    cfg = HiFiGANConfig(upsample_rates=(4, 2), upsample_kernel_sizes=(8, 4),
                        upsample_initial_channel=16,
                        resblock_kernel_sizes=(3, 5),
                        resblock_dilation_sizes=((1, 3), (1, 3)),
                        n_mel_channels=8)
    torch.manual_seed(0)
    oracle = TorchMiniGen(cfg)
    # build the upstream-style flat state dict (resblocks.{i}.{j}.convsX.{l}.*)
    sd = {}
    full = oracle.state_dict()
    for k, v in full.items():
        sd[k] = v
    mel = rng.standard_normal((2, 12, 8)).astype(np.float32)
    with torch.no_grad():
        want = oracle(torch.from_numpy(mel.transpose(0, 2, 1))).numpy()[:, 0]

    gen = Generator(config=cfg)
    variables = load_torch_generator_params(sd, cfg)
    got = np.asarray(gen.apply(variables, jnp.asarray(mel)))
    assert got.shape == (2, 12 * 8)
    np.testing.assert_allclose(got, want, atol=2e-4)


def test_discriminators_and_losses(rng):
    y = jnp.asarray(rng.standard_normal((2, 512)).astype(np.float32) * 0.1)
    yh = jnp.asarray(rng.standard_normal((2, 512)).astype(np.float32) * 0.1)
    mpd = MultiPeriodDiscriminator(periods=(2, 3))
    v = mpd.init(jax.random.key(0), y, yh)
    outs_r, outs_g, fr, fg = mpd.apply(v, y, yh)
    assert len(outs_r) == 2
    d_loss = discriminator_loss(outs_r, outs_g)
    g_loss = generator_adv_loss(outs_g) + feature_loss(fr, fg)
    assert np.isfinite(float(d_loss)) and np.isfinite(float(g_loss))

    msd = MultiScaleDiscriminator(n_scales=2)
    v = msd.init(jax.random.key(1), y, yh)
    outs_r, outs_g, fr, fg = msd.apply(v, y, yh)
    assert len(outs_r) == 2
    assert np.isfinite(float(discriminator_loss(outs_r, outs_g)))


def test_denoiser_reduces_bias(rng):
    cfg = HiFiGANConfig(upsample_rates=(4, 2), upsample_kernel_sizes=(8, 4),
                        upsample_initial_channel=16,
                        resblock_kernel_sizes=(3,),
                        resblock_dilation_sizes=((1, 3),),
                        n_mel_channels=8)
    gen = Generator(config=cfg)
    mel0 = jnp.zeros((1, 88, 8))
    variables = gen.init(jax.random.key(0), mel0)
    den = Denoiser(gen.apply, variables, n_mel_channels=8,
                   filter_length=256, win_length=256)
    audio = gen.apply(variables, jnp.asarray(
        rng.standard_normal((1, 96, 8)).astype(np.float32)))
    out = den(audio, strength=0.1)
    assert out.shape[0] == 1 and np.isfinite(np.asarray(out)).all()
