"""Vocoder training: HiFi-GAN GAN step runs/learns; WaveGlow invertibility."""
import jax
import jax.numpy as jnp
import numpy as np

from radmmm_tpu.ops.stft import MelSpectrogram
from radmmm_tpu.training.vocoder_train import (HiFiGANTrainer,
                                               VocoderTrainConfig,
                                               random_segments)
from radmmm_tpu.vocoder.hifigan import HiFiGANConfig
from radmmm_tpu.vocoder.waveglow import WaveGlow, waveglow_loss
from tests.test_pitch import tone


def small_gen_cfg():
    return HiFiGANConfig(upsample_rates=(8, 8, 4),
                         upsample_kernel_sizes=(16, 16, 8),
                         upsample_initial_channel=32,
                         resblock_kernel_sizes=(3,),
                         resblock_dilation_sizes=((1, 3),),
                         n_mel_channels=80)


def test_hifigan_gan_step_runs_and_improves(rng):
    cfg = VocoderTrainConfig(segment_size=2048, mel_fmax_loss=None)
    trainer = HiFiGANTrainer(small_gen_cfg(), cfg)
    mel_fn = MelSpectrogram(1024, 256, 1024, 80, 22050, 0.0, None)
    audio = np.stack([tone(200.0, dur=0.3), tone(300.0, dur=0.3)])
    lens = np.array([len(audio[0])] * 2)
    batch = random_segments(audio, lens, mel_fn, cfg.segment_size,
                            np.random.default_rng(0))
    assert batch["audio"].shape == (2, 2048)
    assert batch["mel"].shape == (2, 8, 80)

    state = trainer.init_state(jax.random.key(0), batch)
    metrics_first = None
    for i in range(4):
        state, metrics = trainer.train_step(state, batch)
        if metrics_first is None:
            metrics_first = {k: float(v) for k, v in metrics.items()}
    final = {k: float(v) for k, v in metrics.items()}
    assert np.isfinite(list(final.values())).all()
    assert int(state.step) == 4
    # mel reconstruction term should move down even in 4 steps
    assert final["gen_mel"] <= metrics_first["gen_mel"] + 0.05


def test_waveglow_forward_inverse(rng):
    wg = WaveGlow(n_flows=4, n_group=4, n_early_every=2, n_early_size=2,
                  wn_channels=16, wn_layers=2, hop_length=64,
                  upsample_kernel=128)
    B, T_mel = 2, 8
    audio = jnp.asarray(rng.standard_normal((B, T_mel * 64)).astype(np.float32))
    mel = jnp.asarray(rng.standard_normal((B, T_mel, 80)).astype(np.float32))
    variables = wg.init(jax.random.key(0), audio, mel)
    out = wg.apply(variables, audio, mel)
    assert out["z"].shape[-1] == 4
    assert len(out["log_s_list"]) == 4
    loss = waveglow_loss(out)
    assert np.isfinite(float(loss))

    # gradient flows
    def loss_fn(p):
        return waveglow_loss(wg.apply({**variables, "params": p},
                                      audio, mel))
    g = jax.grad(loss_fn)(variables["params"])
    assert all(np.isfinite(np.asarray(l)).all()
               for l in jax.tree_util.tree_leaves(g))

    # inference produces audio of the right length and is finite
    syn = wg.apply(variables, jax.random.key(1), mel, 0.7,
                   method=WaveGlow.infer)
    assert syn.shape[0] == B
    assert np.isfinite(np.asarray(syn)).all()


def test_waveglow_training_reduces_loss(rng):
    import optax
    wg = WaveGlow(n_flows=2, n_group=4, n_early_every=4, n_early_size=2,
                  wn_channels=16, wn_layers=2, hop_length=64,
                  upsample_kernel=128)
    audio = jnp.asarray(tone(220.0, sr=22050, dur=0.05)[None, :1024])
    mel = jnp.asarray(rng.standard_normal((1, 16, 80)).astype(np.float32))
    variables = wg.init(jax.random.key(0), audio, mel)
    tx = optax.adam(1e-3)
    params = variables["params"]
    opt = tx.init(params)

    @jax.jit
    def step(params, opt):
        def loss_fn(p):
            return waveglow_loss(wg.apply({"params": p}, audio, mel))
        loss, g = jax.value_and_grad(loss_fn)(params)
        upd, opt = tx.update(g, opt, params)
        return optax.apply_updates(params, upd), opt, loss

    losses = []
    for i in range(20):
        params, opt, loss = step(params, opt)
        losses.append(float(loss))
    assert losses[-1] < losses[0]
    assert np.isfinite(losses).all()


def test_istftnet_generator_trains(rng):
    """iSTFTNet-style head (arXiv:2203.02395): C8C8I generator produces
    exact-length audio and the GAN step reduces the mel term."""
    gen_cfg = HiFiGANConfig(upsample_rates=(8, 8),
                            upsample_kernel_sizes=(16, 16),
                            upsample_initial_channel=32,
                            resblock_kernel_sizes=(3,),
                            resblock_dilation_sizes=((1, 3),),
                            n_mel_channels=80,
                            gen_istft_n_fft=16, gen_istft_hop=4)
    assert gen_cfg.hop_length == 256
    cfg = VocoderTrainConfig(segment_size=2048, mel_fmax_loss=None)
    trainer = HiFiGANTrainer(gen_cfg, cfg)
    mel_fn = MelSpectrogram(1024, 256, 1024, 80, 22050, 0.0, None)
    audio = np.stack([tone(200.0, dur=0.3), tone(300.0, dur=0.3)])
    lens = np.array([len(audio[0])] * 2)
    batch = random_segments(audio, lens, mel_fn, cfg.segment_size,
                            np.random.default_rng(0))

    state = trainer.init_state(jax.random.key(0), batch)
    # generator output length matches the standard head exactly
    y = trainer.gen.apply({"params": state.gen_params}, batch["mel"])
    assert y.shape == (2, batch["mel"].shape[1] * 256)
    assert np.isfinite(np.asarray(y)).all()

    first = None
    for i in range(6):
        state, metrics = trainer.train_step(state, batch)
        if first is None:
            first = {k: float(v) for k, v in metrics.items()}
    final = {k: float(v) for k, v in metrics.items()}
    assert np.isfinite(list(final.values())).all()
    assert final["gen_mel"] < first["gen_mel"]


def test_gaussian_blur_augmentation():
    """Kernel bank + augment semantics of the reference's
    GaussianBlurAugmentation (vocoders/hifigan_models.py:56-101): kernels
    are the torch construction verbatim (torch-oracle check), constant
    fields are fixed points under reflect padding, p gates apply/skip."""
    import torch
    import math
    from radmmm_tpu.vocoder.hifigan import (gaussian_blur_augment,
                                            gaussian_blur_kernels)

    kernel_size, sigmas = (5, 5), (0.5, 1.0, 2.0)
    bank = np.asarray(gaussian_blur_kernels(kernel_size, sigmas))

    # torch oracle: the reference's initialize_kernels body
    mesh_grids = torch.meshgrid(
        [torch.arange(s, dtype=torch.float32) for s in kernel_size],
        indexing="ij")
    for i, sigma in enumerate(sigmas):
        kernel = 1
        for size, std, mgrid in zip(kernel_size, [sigma] * 2, mesh_grids):
            mean = (size - 1) / 2
            kernel = kernel * (1 / (std * math.sqrt(2 * math.pi))
                               * torch.exp(-((mgrid - mean) / std) ** 2 / 2))
        kernel = kernel / torch.sum(kernel)
        np.testing.assert_allclose(bank[i], kernel.numpy(), rtol=1e-6,
                                   atol=1e-7)

    mel = jnp.asarray(np.random.default_rng(0)
                      .standard_normal((2, 32, 16)).astype(np.float32))
    kernels = gaussian_blur_kernels(kernel_size, sigmas)
    key = jax.random.key(3)
    # p=0 -> identity; p=1 -> actually blurred (variance shrinks)
    out0 = gaussian_blur_augment(mel, key, kernels, 0.0)
    np.testing.assert_allclose(np.asarray(out0), np.asarray(mel))
    out1 = gaussian_blur_augment(mel, key, kernels, 1.0)
    assert out1.shape == mel.shape
    assert float(jnp.var(out1)) < float(jnp.var(mel))
    # reflect padding keeps constants exactly invariant
    const = jnp.full((1, 16, 8), 0.7)
    outc = gaussian_blur_augment(const, key, kernels, 1.0)
    np.testing.assert_allclose(np.asarray(outc), 0.7, rtol=1e-5)


def test_hifigan_trainer_with_blur_runs():
    """blur_p > 0 trains finite and changes the generator input path."""
    from radmmm_tpu.training.vocoder_train import (HiFiGANTrainer,
                                                   VocoderTrainConfig,
                                                   random_segments)
    from radmmm_tpu.ops.stft import MelSpectrogram
    from radmmm_tpu.vocoder.hifigan import HiFiGANConfig

    gen_cfg = HiFiGANConfig(upsample_rates=(8, 4), upsample_kernel_sizes=(16, 8),
                            upsample_initial_channel=16,
                            resblock_kernel_sizes=(3,),
                            resblock_dilation_sizes=((1,),))
    cfg = VocoderTrainConfig(segment_size=1024, hop_length=32,
                             filter_length=128, win_length=128,
                             blur_p=0.5)
    trainer = HiFiGANTrainer(gen_cfg, cfg)
    mel_fn = MelSpectrogram(128, 32, 128, 80, 22050, 0.0, None)
    audio = np.stack([tone(220.0, dur=0.1), tone(330.0, dur=0.1)])
    lens = np.array([len(audio[0])] * 2)
    batch = random_segments(audio, lens, mel_fn, cfg.segment_size,
                            np.random.default_rng(0))
    state = trainer.init_state(jax.random.key(0), batch)
    for _ in range(3):
        state, metrics = trainer.train_step(state, batch)
    assert np.isfinite([float(v) for v in metrics.values()]).all()
