"""WaveGlow vocoder: torch-oracle parity via the checkpoint converter,
invertibility, MLE training smoke, and get_vocoder dispatch
(reference: vocoders/waveglow_for_LIMMITS23/glow.py, vocoder_utils.py)."""
import json
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from radmmm_tpu.vocoder.waveglow import (WaveGlow, waveglow_loss,
                                         load_torch_waveglow_params,
                                         load_waveglow_config)

REF = "/root/reference/vocoders/waveglow_for_LIMMITS23"

TINY = dict(n_mel_channels=8, n_flows=4, n_group=4, n_early_every=2,
            n_early_size=2, wn_channels=16, wn_layers=2)


def _torch_waveglow():
    if not os.path.isdir(REF):
        pytest.skip("reference not mounted")
    sys.path.insert(0, REF)
    try:
        import glow as ref_glow
        import importlib
        importlib.reload(ref_glow)
        torch.manual_seed(0)
        model = ref_glow.WaveGlow(
            n_mel_channels=TINY["n_mel_channels"], n_flows=TINY["n_flows"],
            n_group=TINY["n_group"], n_early_every=TINY["n_early_every"],
            n_early_size=TINY["n_early_size"],
            WN_config=dict(n_layers=TINY["wn_layers"],
                           n_channels=TINY["wn_channels"], kernel_size=3))
        return model, ref_glow
    finally:
        sys.path.pop(0)


@pytest.fixture(scope="module")
def torch_pair(rng=None):
    model, ref_glow = _torch_waveglow()
    ours = WaveGlow(**TINY)
    variables = load_torch_waveglow_params(model.state_dict(), ours)
    return model, ref_glow, ours, variables


def test_forward_matches_torch_reference(torch_pair, rng):
    """Converted weights: z, per-flow log_s and 1x1 logdets, and the flow
    NLL all match the vendored torch WaveGlow."""
    model, ref_glow, ours, variables = torch_pair
    B, T_mel = 2, 8
    hop = 256
    audio = rng.standard_normal((B, T_mel * hop)).astype(np.float32) * 0.1
    mel = rng.standard_normal((B, T_mel, TINY["n_mel_channels"]))\
        .astype(np.float32)

    out = ours.apply(variables, jnp.asarray(audio), jnp.asarray(mel))
    with torch.no_grad():
        z_t, log_s_list_t, log_det_t = model(
            (torch.from_numpy(mel.transpose(0, 2, 1)),
             torch.from_numpy(audio)))

    z = np.asarray(out["z"])            # (B, Tg, g)
    np.testing.assert_allclose(z.transpose(0, 2, 1), z_t.numpy(),
                               atol=2e-4, rtol=1e-4)
    Tg = z.shape[1]
    for i, (ls, ls_t) in enumerate(zip(out["log_s_list"], log_s_list_t)):
        np.testing.assert_allclose(float(jnp.sum(ls)),
                                   float(ls_t.sum()), atol=2e-2,
                                   err_msg=f"log_s flow {i}")
        # torch logdet is pre-scaled by batch*n_groups; qr init makes W
        # orthogonal so both sides are ~0 — compare with f32 atol
        np.testing.assert_allclose(
            float(out["log_det_W_list"][i]) * B * Tg,
            float(log_det_t[i]), rtol=1e-4, atol=2e-3,
            err_msg=f"logdet flow {i}")

    loss = float(waveglow_loss(out, sigma=1.0))
    crit = ref_glow.WaveGlowLoss(sigma=1.0)
    with torch.no_grad():
        loss_t = float(crit((z_t, log_s_list_t, log_det_t)))
    np.testing.assert_allclose(loss, loss_t, rtol=1e-4)


def test_infer_invertibility(torch_pair, rng):
    """infer(residual=forward(audio).z) reconstructs the audio."""
    _, _, ours, variables = torch_pair
    B, T_mel, hop = 1, 8, 256
    audio = rng.standard_normal((B, T_mel * hop)).astype(np.float32) * 0.1
    mel = rng.standard_normal((B, T_mel, TINY["n_mel_channels"]))\
        .astype(np.float32)
    out = ours.apply(variables, jnp.asarray(audio), jnp.asarray(mel))
    rec = ours.apply(variables, jax.random.key(0), jnp.asarray(mel),
                     residual=out["z"], method=WaveGlow.infer)
    np.testing.assert_allclose(np.asarray(rec)[0], audio[0], atol=5e-4)


def test_get_vocoder_waveglow_dispatch(torch_pair, tmp_path):
    """get_vocoder('waveglow', config, ckpt) loads a torch checkpoint and
    synthesizes (reference vocoder_utils.py:86-92 waveglow branch)."""
    model, _, _, _ = torch_pair
    ckpt = tmp_path / "waveglow_256ch.pt"
    torch.save({"model": model.state_dict()}, ckpt)
    cfg = {"waveglow_config": {
        "n_mel_channels": TINY["n_mel_channels"], "n_flows": TINY["n_flows"],
        "n_group": TINY["n_group"], "n_early_every": TINY["n_early_every"],
        "n_early_size": TINY["n_early_size"],
        "WN_config": {"n_layers": TINY["wn_layers"],
                      "n_channels": TINY["wn_channels"], "kernel_size": 3}}}
    cpath = tmp_path / "config.json"
    cpath.write_text(json.dumps(cfg))

    from radmmm_tpu.vocoder.utils import get_vocoder, get_audio_for_mels
    voc_fn, denoiser = get_vocoder("waveglow", str(cpath), str(ckpt))
    assert voc_fn is not None and denoiser is not None
    mel = jnp.zeros((1, 8, TINY["n_mel_channels"]))
    audio = get_audio_for_mels(mel, "waveglow", voc_fn, denoiser,
                               denoiser_strength=0.001)
    assert audio.shape == (1, 8 * 256)
    assert np.isfinite(np.asarray(audio)).all()


def test_waveglow_config_loader(tmp_path):
    cfg = {"waveglow_config": {"n_flows": 6, "n_group": 8,
                               "WN_config": {"n_layers": 4,
                                             "n_channels": 64}},
           "data_config": {"hop_length": 160}}
    p = tmp_path / "c.json"
    p.write_text(json.dumps(cfg))
    kw = load_waveglow_config(str(p))
    assert kw == {"n_flows": 6, "n_group": 8, "wn_layers": 4,
                  "wn_channels": 64, "hop_length": 160}


def test_waveglow_training_smoke(rng):
    """40 MLE steps on tone segments: NLL must decrease markedly
    (the vendored train.py capability, now first-class)."""
    from radmmm_tpu.training.vocoder_train import (WaveGlowTrainer,
                                                   VocoderTrainConfig)
    from tests.test_pitch import tone

    cfg = VocoderTrainConfig(segment_size=1024, learning_rate=1e-3,
                             filter_length=256, hop_length=64,
                             win_length=256, n_mel_channels=8,
                             mel_fmax=4000.0)
    trainer = WaveGlowTrainer(
        dict(n_mel_channels=8, n_flows=3, n_group=4, n_early_every=2,
             n_early_size=2, wn_channels=16, wn_layers=2,
             upsample_kernel=256),
        cfg)
    wav = tone(220, dur=1.2).astype(np.float32)
    audio = np.stack([wav[:1024], wav[512:1536]])
    mel = trainer.mel_loss_fn(jnp.asarray(audio))[:, :1024 // 64]
    batch = {"audio": jnp.asarray(audio), "mel": mel}
    state = trainer.init_state(jax.random.key(0), batch)
    losses = []
    for _ in range(40):
        state, metrics = trainer.train_step(state, batch)
        losses.append(float(metrics["nll"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0] - 0.5, losses[::8]
