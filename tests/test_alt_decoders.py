"""Deterministic + diffusion decoder regimes and acronym normalizer."""
import jax
import jax.numpy as jnp
import numpy as np

from radmmm_tpu.losses.flow import RADTTSDeterministicLoss, RADTTSDiffusionLoss
from radmmm_tpu.models.alt_decoders import (DeterministicDecoder,
                                            DiffusionDecoder,
                                            DiffusionSchedule)
from radmmm_tpu.text.acronyms import AcronymNormalizer
from radmmm_tpu.utils.masking import SeqLens


def make_ctx(rng, B=2, T=16, C=12):
    ctx = jnp.asarray(rng.standard_normal((B, T, C)).astype(np.float32))
    spk = jnp.asarray(rng.standard_normal((B, 4)).astype(np.float32))
    lens = SeqLens.create(jnp.asarray([T, T - 6]), T)
    return ctx, spk, lens


def attn_stub(rng, B, T_mel, T_text):
    a = rng.uniform(0.01, 1, (B, T_mel, T_text)).astype(np.float32)
    a /= a.sum(-1, keepdims=True)
    return jnp.asarray(a)


def test_deterministic_decoder_and_loss(rng):
    ctx, spk, lens = make_ctx(rng)
    dec = DeterministicDecoder(n_mel_channels=8, n_layers=2, n_channels=16)
    f0 = jnp.asarray(rng.uniform(0, 1, (2, 16)).astype(np.float32))
    variables = dec.init(jax.random.key(0), ctx, spk, lens, f0, f0)
    out = dec.apply(variables, ctx, spk, lens, f0, f0)
    assert out["mel_hat"].shape == (2, 16, 8)
    mel = jnp.asarray(rng.standard_normal((2, 16, 8)).astype(np.float32))
    in_lens = SeqLens.create(jnp.asarray([5, 4]), 6)
    model_output = {"mel": mel, "mel_hat": out["mel_hat"],
                    "attn": attn_stub(rng, 2, 16, 6),
                    "attn_soft": attn_stub(rng, 2, 16, 6),
                    "attn_logprob": jnp.log(attn_stub(rng, 2, 16, 6))}
    ld = RADTTSDeterministicLoss()(model_output, in_lens, lens, True)
    assert np.isfinite(float(ld["mel_mae_loss"][0]))
    assert "loss_ctc" in ld


def test_diffusion_decoder_train_and_sample(rng):
    ctx, spk, lens = make_ctx(rng, C=12)
    dec = DiffusionDecoder(n_mel_channels=8, n_context_dim=12, n_layers=2,
                           n_channels=16,
                           schedule=DiffusionSchedule(n_steps=5))
    mel = jnp.asarray(rng.standard_normal((2, 16, 8)).astype(np.float32))
    variables = dec.init(jax.random.key(0), jax.random.key(1), mel, ctx,
                         lens)
    out = dec.apply(variables, jax.random.key(2), mel, ctx, lens)
    assert out["noise"].shape == out["noise_hat"].shape == (2, 16, 8)
    in_lens = SeqLens.create(jnp.asarray([5, 4]), 6)
    model_output = {**out, "attn": attn_stub(rng, 2, 16, 6),
                    "attn_soft": attn_stub(rng, 2, 16, 6),
                    "attn_logprob": jnp.log(attn_stub(rng, 2, 16, 6))}
    ld = RADTTSDiffusionLoss()(model_output, in_lens, lens, False)
    assert np.isfinite(float(ld["noise_mse_loss"][0]))

    # gradient flows through the eps-prediction
    def loss_fn(p):
        o = dec.apply({"params": p}, jax.random.key(3), mel, ctx, lens)
        return jnp.mean((o["noise"] - o["noise_hat"]) ** 2)
    g = jax.grad(loss_fn)(variables["params"])
    assert all(np.isfinite(np.asarray(l)).all()
               for l in jax.tree_util.tree_leaves(g))

    # ancestral sampling produces a finite masked mel
    sampled = dec.apply(variables, jax.random.key(4), ctx, lens,
                        method=DiffusionDecoder.infer)
    assert sampled.shape == (2, 16, 8)
    assert np.isfinite(np.asarray(sampled)).all()
    assert np.abs(np.asarray(sampled)[1, 10:]).max() == 0  # masked tail


def test_acronym_normalizer():
    norm = AcronymNormalizer()
    out = norm("the NASA launch")
    assert out.startswith("the {EH1 N} {EY1}")  # N A S A spelled out
    assert out.count("{") == 4
    out2 = norm("use GPUs now")
    # plural folds Z into the final letter
    assert out2.count("{") == 3 and " Z}" in out2

    class FakeDict:
        def lookup(self, w):
            return ["N AE1 S AH0"] if w == "NASA" else None

    out3 = AcronymNormalizer(FakeDict())("the NASA launch")
    assert "{N AE1 S AH0}" in out3


def test_e2e_gan_decoder_regime(rng):
    from radmmm_tpu.losses.flow import RADTTSE2EGANLoss
    from radmmm_tpu.models.alt_decoders import E2ETTSDecoder
    from radmmm_tpu.vocoder.hifigan import HiFiGANConfig

    ctx, spk, lens = make_ctx(rng, T=32)
    cfg = HiFiGANConfig(upsample_rates=(4, 2), upsample_kernel_sizes=(8, 4),
                        upsample_initial_channel=16,
                        resblock_kernel_sizes=(3,),
                        resblock_dilation_sizes=((1, 3),),
                        n_mel_channels=8)
    dec = E2ETTSDecoder(n_mel_channels=8, n_speaker_dim=4, n_layers=1,
                        n_channels=16, vocoder_config=cfg)
    f0 = jnp.asarray(rng.uniform(0, 1, (2, 32)).astype(np.float32))
    variables = dec.init(jax.random.key(0), ctx, spk, lens, f0, f0)
    out = dec.apply(variables, ctx, spk, lens, f0, f0, train=False)
    assert out["audio_hat"].shape == (2, 32 * 8)

    audio_gt = jnp.asarray(
        rng.standard_normal((2, 32 * 8)).astype(np.float32) * 0.1)
    audio_lens = jnp.asarray([32 * 8, 20 * 8], jnp.float32)
    in_lens = SeqLens.create(jnp.asarray([6, 4]), 6)
    model_output = {
        **out,
        "attn": attn_stub(rng, 2, 32, 6),
        "attn_soft": attn_stub(rng, 2, 32, 6),
        "attn_logprob": jnp.log(attn_stub(rng, 2, 32, 6))}
    loss_fn = RADTTSE2EGANLoss(fft_lengths=(256, 512),
                               hop_lengths=(64, 128),
                               win_lengths=(256, 512))
    ld = loss_fn(model_output, audio_gt, audio_lens, in_lens, lens, False)
    assert np.isfinite(float(ld["stft_loss_sc"][0]))
    assert np.isfinite(float(ld["stft_loss_mag"][0]))
    assert "loss_ctc" in ld
