"""Serving export: AOT artifact round-trips and matches live inference."""
import functools

import jax
import jax.numpy as jnp
import numpy as np

from radmmm_tpu.models.tts import TTSModel
from radmmm_tpu.serving import export_tts, load_tts, make_tts_fn
from tests.test_tts_model import tiny_config, tiny_batch


def test_export_roundtrip_matches_live(tmp_path):
    rng = np.random.default_rng(0)
    model = TTSModel(config=tiny_config())
    batch = tiny_batch(rng)
    variables = jax.jit(
        functools.partial(model.init, binarize=False, train=True))(
            {"params": jax.random.key(0), "dropout": jax.random.key(1)},
            batch)

    B, T = 2, 12
    path = str(tmp_path / "tts.bin")
    n = export_tts(model, variables, path, batch_size=B, max_text=T,
                   sigma=0.8, max_frames=64)
    assert n > 10_000

    served = load_tts(path)
    assert served.in_avals[0].shape == (B, T)

    args = (rng.integers(1, 30, (B, T)).astype(np.int32),
            np.asarray([T, T - 3], np.int32),
            np.asarray([0, 2], np.int32),
            np.asarray([0, 1], np.int32),
            np.asarray([5.0, 5.2], np.float32),
            np.asarray([0.3, 0.4], np.float32),
            np.int32(7))
    mel_served, lens_served = served(*args)

    live = jax.jit(make_tts_fn(model, variables, sigma=0.8, max_frames=64))
    mel_live, lens_live = live(*[jnp.asarray(a) for a in args])

    np.testing.assert_array_equal(np.asarray(lens_served),
                                  np.asarray(lens_live))
    np.testing.assert_allclose(np.asarray(mel_served),
                               np.asarray(mel_live), atol=1e-5)
    assert np.isfinite(np.asarray(mel_served)).all()
    # different seed -> different sample (the flow residual is stochastic)
    mel2, _ = served(*args[:-1], np.int32(8))
    assert not np.allclose(np.asarray(mel2), np.asarray(mel_served))


def test_multibucket_export_dispatch(tmp_path):
    """Multi-bucket artifact: shape-dispatch to the smallest covering
    bucket, batch/text padding trimmed on return, matches live inference."""
    import pytest

    rng = np.random.default_rng(1)
    model = TTSModel(config=tiny_config())
    batch = tiny_batch(rng)
    variables = jax.jit(
        functools.partial(model.init, binarize=False, train=True))(
            {"params": jax.random.key(0), "dropout": jax.random.key(1)},
            batch)

    path = str(tmp_path / "tts_multi.bin")
    n = export_tts(model, variables, path, sigma=0.8, max_frames=64,
                   buckets=[(2, 12), (1, 8)])
    assert n > 20_000

    served = load_tts(path)
    assert served.buckets == [(1, 8), (2, 12)]

    def live_at(B, T):
        return jax.jit(make_tts_fn(model, variables, sigma=0.8,
                                   max_frames=64))

    # exact small-bucket request
    args1 = (rng.integers(1, 30, (1, 8)).astype(np.int32),
             np.asarray([8], np.int32), np.asarray([1], np.int32),
             np.asarray([0], np.int32), np.asarray([5.0], np.float32),
             np.asarray([0.3], np.float32), np.int32(3))
    mel1, lens1 = served(*args1)
    assert mel1.shape[0] == 1
    mel1_live, lens1_live = live_at(1, 8)(*[jnp.asarray(a) for a in args1])
    np.testing.assert_array_equal(np.asarray(lens1), np.asarray(lens1_live))
    np.testing.assert_allclose(np.asarray(mel1), np.asarray(mel1_live),
                               atol=1e-5)

    # odd request (2, 10): dispatches to (2, 12), pads text, trims back;
    # must equal live inference on the manually-padded batch
    text = rng.integers(1, 30, (2, 10)).astype(np.int32)
    args2 = (text, np.asarray([10, 7], np.int32),
             np.asarray([0, 2], np.int32), np.asarray([0, 1], np.int32),
             np.asarray([5.0, 5.2], np.float32),
             np.asarray([0.3, 0.4], np.float32), np.int32(5))
    mel2, lens2 = served(*args2)
    assert mel2.shape[0] == 2
    text_pad = np.zeros((2, 12), np.int32)
    text_pad[:, :10] = text
    mel2_live, lens2_live = live_at(2, 12)(
        jnp.asarray(text_pad), *[jnp.asarray(a) for a in args2[1:]])
    np.testing.assert_array_equal(np.asarray(lens2), np.asarray(lens2_live))
    np.testing.assert_allclose(np.asarray(mel2), np.asarray(mel2_live),
                               atol=1e-5)

    # oversize request fails loudly
    with pytest.raises(ValueError, match="exceeds every exported bucket"):
        served(np.ones((3, 8), np.int32), np.asarray([8, 8, 8], np.int32),
               np.zeros((3,), np.int32), np.zeros((3,), np.int32),
               np.full((3,), 5.0, np.float32), np.full((3,), 0.3, np.float32),
               np.int32(0))


def test_vocoder_export_int16_pcm(tmp_path):
    """Audio artifacts quantize to int16 PCM ON DEVICE (half the serving
    egress per fetched sample): the exported output must be int16 and equal
    the f32 path quantized on host."""
    from radmmm_tpu.vocoder.hifigan import Generator, HiFiGANConfig

    rng = np.random.default_rng(2)
    model = TTSModel(config=tiny_config())
    batch = tiny_batch(rng)
    variables = jax.jit(
        functools.partial(model.init, binarize=False, train=True))(
            {"params": jax.random.key(0), "dropout": jax.random.key(1)},
            batch)
    voc = Generator(config=HiFiGANConfig(
        upsample_rates=(4, 2), upsample_kernel_sizes=(8, 4),
        upsample_initial_channel=16, resblock_kernel_sizes=(3, 5),
        resblock_dilation_sizes=((1, 3), (1, 3)), n_mel_channels=8))
    voc_vars = jax.jit(voc.init)(jax.random.key(7), jnp.zeros((1, 16, 8)))

    B, T = 1, 8
    path = str(tmp_path / "tts_audio.bin")
    export_tts(model, variables, path, batch_size=B, max_text=T,
               sigma=0.8, max_frames=32, vocoder=voc, vocoder_vars=voc_vars)
    served = load_tts(path)
    args = (rng.integers(1, 30, (B, T)).astype(np.int32),
            np.asarray([T], np.int32), np.asarray([0], np.int32),
            np.asarray([0], np.int32), np.asarray([5.0], np.float32),
            np.asarray([0.3], np.float32), np.int32(4))
    audio, lens = served(*args)
    audio = np.asarray(audio)
    assert audio.dtype == np.int16 and audio.ndim == 2
    assert audio.shape[1] == 32 * 8  # max_frames * prod(upsample_rates)

    f32 = jax.jit(make_tts_fn(model, variables, sigma=0.8, max_frames=32,
                              vocoder=voc, vocoder_vars=voc_vars,
                              pcm_int16=False))
    ref, ref_lens = f32(*[jnp.asarray(a) for a in args])
    want = np.round(np.clip(np.asarray(ref), -1, 1) * 32767.0)
    np.testing.assert_array_equal(np.asarray(ref_lens), np.asarray(lens))
    # rounding boundary wiggle: allow 1 LSB
    assert np.abs(audio.astype(np.float64) - want).max() <= 1

    # the server's WAV encoder passes int16 through unscaled
    from radmmm_tpu.server import _wav_bytes
    blob = _wav_bytes(audio[0], 22050)
    import io
    import wave
    with wave.open(io.BytesIO(blob)) as w:
        assert w.getsampwidth() == 2 and w.getnframes() == audio.shape[1]
        got = np.frombuffer(w.readframes(w.getnframes()), "<i2")
    np.testing.assert_array_equal(got, audio[0])


def _tiny_model_and_vars(seed=3):
    rng = np.random.default_rng(seed)
    model = TTSModel(config=tiny_config())
    batch = tiny_batch(rng)
    variables = jax.jit(
        functools.partial(model.init, binarize=False, train=True))(
            {"params": jax.random.key(0), "dropout": jax.random.key(1)},
            batch)
    return rng, model, variables


def test_two_stage_matches_monolithic_infer():
    """TwoStageTTS at a forced single bucket == monolithic infer at the
    same max_frames (pure refactor: same ops, same rng)."""
    from radmmm_tpu.serving import TwoStageTTS

    rng, model, variables = _tiny_model_and_vars()
    B, T, MF = 2, 7, 32
    args = (jnp.asarray(rng.integers(1, 30, (B, T)), jnp.int32),
            jnp.asarray([T, T - 2], jnp.int32),
            jnp.asarray([0, 2], jnp.int32),
            jnp.asarray([0, 1], jnp.int32),
            jnp.asarray([5.0, 5.2], jnp.float32),
            jnp.asarray([0.3, 0.4], jnp.float32))
    seed = 11

    mono = jax.jit(make_tts_fn(model, variables, sigma=0.8, max_frames=MF))
    mel1, lens1 = mono(*args, jnp.int32(seed))

    ts = TwoStageTTS(model, variables, frame_buckets=(MF,), sigma=0.8)
    mel2, lens2 = ts(*args, seed)
    np.testing.assert_array_equal(np.asarray(lens1), np.asarray(lens2))
    np.testing.assert_allclose(np.asarray(mel1), np.asarray(mel2),
                               atol=1e-5)


def test_two_stage_bucket_selection():
    """The dispatcher picks the smallest frame bucket covering the
    predicted total frames; the mel comes back at that bucket's length and
    lens never exceed it."""
    from radmmm_tpu.serving import TwoStageTTS

    rng, model, variables = _tiny_model_and_vars(seed=4)
    B, T = 2, 7
    args = (jnp.asarray(rng.integers(1, 30, (B, T)), jnp.int32),
            jnp.asarray([T, T], jnp.int32),
            jnp.asarray([0, 1], jnp.int32),
            jnp.asarray([0, 1], jnp.int32),
            jnp.asarray([5.0, 5.0], jnp.float32),
            jnp.asarray([0.3, 0.3], jnp.float32))
    ts = TwoStageTTS(model, variables, frame_buckets=(16, 32, 64),
                     sigma=0.8)
    _, _, n_frames = ts.dur(*args[:4])
    expect = ts.pick_bucket(n_frames)
    mel, lens = ts(*args, 5)
    assert mel.shape[1] == expect
    assert int(np.asarray(lens).max()) <= expect
    # a tighter ladder picks a smaller program for the same request
    ts_small = TwoStageTTS(model, variables, frame_buckets=(8,), sigma=0.8)
    mel_s, lens_s = ts_small(*args, 5)
    assert mel_s.shape[1] == 8 and int(np.asarray(lens_s).max()) <= 8


def test_two_stage_export_roundtrip(tmp_path):
    """Version-2 (two-stage) artifact: dur program + per-frame-bucket
    decode programs; the loaded callable matches the in-process
    TwoStageTTS bit-for-bit at the same seed."""
    from radmmm_tpu.serving import TwoStageTTS

    rng, model, variables = _tiny_model_and_vars(seed=5)
    B, T = 2, 7
    path = str(tmp_path / "tts2.bin")
    n = export_tts(model, variables, path, sigma=0.8,
                   buckets=[(B, T)], frame_buckets=(16, 48))
    assert n > 10_000
    served = load_tts(path)
    assert served.buckets == [(B, T)]
    assert served.frame_buckets == [16, 48]

    args = (rng.integers(1, 30, (B, T)).astype(np.int32),
            np.asarray([T, T - 1], np.int32),
            np.asarray([1, 2], np.int32),
            np.asarray([0, 1], np.int32),
            np.asarray([5.0, 5.1], np.float32),
            np.asarray([0.3, 0.35], np.float32))
    mel_served, lens_served = served(*args, np.int32(9))

    ts = TwoStageTTS(model, variables, frame_buckets=(16, 48), sigma=0.8)
    mel_live, lens_live = ts(*[jnp.asarray(a) for a in args], 9)
    np.testing.assert_array_equal(np.asarray(lens_served),
                                  np.asarray(lens_live))
    np.testing.assert_allclose(np.asarray(mel_served),
                               np.asarray(mel_live), atol=1e-5)
    # a smaller request batch dispatches through padding and trims back
    mel1, lens1 = served(args[0][:1], *[a[:1] for a in args[1:]],
                         np.int32(9))
    assert mel1.shape[0] == 1 and np.asarray(lens1).shape == (1,)


def test_two_stage_bf16_vocoder_head():
    """Serving commonly carries bf16-cast vocoder params (the bench/server
    configuration); both tts fns must cast the f32 mel to the head's param
    dtype instead of tripping a conv dtype mismatch."""
    from radmmm_tpu.serving import TwoStageTTS, make_tts_fn
    from radmmm_tpu.vocoder.hifigan import Generator, HiFiGANConfig

    rng, model, variables = _tiny_model_and_vars(seed=6)
    voc = Generator(config=HiFiGANConfig(
        upsample_rates=(4, 2), upsample_kernel_sizes=(8, 4),
        upsample_initial_channel=16, resblock_kernel_sizes=(3, 5),
        resblock_dilation_sizes=((1, 3), (1, 3)), n_mel_channels=8))
    voc_vars = jax.jit(voc.init)(jax.random.key(7), jnp.zeros((1, 16, 8)))
    voc_vars = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16), voc_vars)

    B, T = 1, 8
    args = (jnp.asarray(rng.integers(1, 30, (B, T)), jnp.int32),
            jnp.asarray([T], jnp.int32), jnp.asarray([0], jnp.int32),
            jnp.asarray([0], jnp.int32), jnp.asarray([5.0], jnp.float32),
            jnp.asarray([0.3], jnp.float32))
    mono = jax.jit(make_tts_fn(model, variables, sigma=0.8, max_frames=16,
                               vocoder=voc, vocoder_vars=voc_vars))
    a1, l1 = mono(*args, jnp.int32(3))
    ts = TwoStageTTS(model, variables, frame_buckets=(16,), sigma=0.8,
                     vocoder=voc, vocoder_vars=voc_vars)
    a2, l2 = ts(*args, 3)
    assert np.asarray(a1).dtype == np.int16
    np.testing.assert_array_equal(np.asarray(a1), np.asarray(a2))
    np.testing.assert_array_equal(np.asarray(l1), np.asarray(l2))


def test_trainer_export_from_checkpoint(tmp_path):
    """CLI-facing path: Trainer.export restores the checkpoint and writes a
    loadable artifact (mel-only: no vocoder ckpt configured)."""
    from radmmm_tpu.training.loop import Trainer, TrainerConfig
    from radmmm_tpu.training.step import LossConfig

    rng = np.random.default_rng(0)
    cfg = tiny_config()
    trainer = Trainer(cfg, LossConfig(n_group_size=2),
                      TrainerConfig(output_directory=str(tmp_path / "run"),
                                    save_code_snapshot=False,
                                    max_infer_frames=64))
    state = trainer._init_state(tiny_batch(rng))
    trainer.ckpt.save(1, state)

    path = str(tmp_path / "artifact.bin")
    n = trainer.export(path, batch_size=1, max_text=8)
    assert n > 10_000
    served = load_tts(path)
    mel, lens = served(np.ones((1, 8), np.int32),
                       np.asarray([8], np.int32),
                       np.zeros((1,), np.int32), np.zeros((1,), np.int32),
                       np.asarray([5.0], np.float32),
                       np.asarray([0.3], np.float32), np.int32(0))
    assert np.isfinite(np.asarray(mel)).all()
    assert 0 < int(np.asarray(lens)[0]) <= 64
