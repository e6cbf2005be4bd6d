"""Benchmark: end-to-end text->audio synthesis throughput on one TPU chip.

Flagship RADMMM configuration (8 flows, WN-1024 couplings, group size 2)
followed by the HiFi-GAN v1 vocoder, batch 32, 800 mel frames per item
(~9.3 s of 22.05 kHz audio at hop 256). The full pipeline — text encoding,
duration/F0/energy/voiced prediction, flow inverse, vocoding to waveform —
runs as one jitted program. Reports the aggregate real-time factor (seconds
of audio synthesized per wall-clock second per chip) against the >=100x
north star (BASELINE.md).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""
from __future__ import annotations

import functools
import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from radmmm_tpu.models.tts import TTSModel, default_radmmm_config
    from radmmm_tpu.ops.conv import set_conv_precision

    # production inference setting: native bf16 MXU throughput with f32
    # accumulation (training default stays full f32 like the reference)
    set_conv_precision("bf16")

    B = 32
    T_TEXT = 96
    MAX_FRAMES = 800
    HOP, SR = 256, 22050

    model = TTSModel(config=default_radmmm_config())
    rng = np.random.default_rng(0)

    text = jnp.asarray(rng.integers(0, 426, (B, T_TEXT)), jnp.int32)
    text_lens = jnp.full((B,), T_TEXT, jnp.int32)
    speaker_ids = jnp.asarray(rng.integers(0, 21, (B,)), jnp.int32)
    accent_ids = jnp.asarray(rng.integers(0, 7, (B,)), jnp.int32)
    f0_mean = jnp.full((B,), 5.0, jnp.float32)
    f0_std = jnp.full((B,), 0.3, jnp.float32)

    # init via a tiny batch (shapes don't matter for params)
    init_batch = {
        "text": text[:2, :8], "input_lengths": jnp.asarray([8, 8], jnp.int32),
        "mel": jnp.zeros((2, 32, 80)), "output_lengths":
            jnp.asarray([32, 32], jnp.int32),
        "speaker_ids": speaker_ids[:2], "accent_ids": accent_ids[:2],
        "f0": jnp.zeros((2, 32)), "voiced_mask": jnp.zeros((2, 32)),
        "energy_avg": jnp.zeros((2, 32)),
        "attn_prior": jnp.full((2, 32, 8), 1.0 / 8),
        "speaker_f0_mean": f0_mean[:2], "speaker_f0_std": f0_std[:2],
    }
    variables = jax.jit(
        functools.partial(model.init, binarize=False, train=False))(
            {"params": jax.random.key(0), "dropout": jax.random.key(1)},
            init_batch)

    from radmmm_tpu.vocoder.hifigan import Generator, HiFiGANConfig
    voc_cfg = HiFiGANConfig()          # v1: 512ch, rates (8,8,2,2)
    vocoder = Generator(config=voc_cfg)
    voc_vars = jax.jit(vocoder.init)(jax.random.key(7),
                                     jnp.zeros((1, 32, 80)))
    # bf16 weights/activations for vocoding: halves HBM traffic on the
    # long upsampled sequences (bf16 keeps fp32 range; standard for
    # neural-vocoder serving)
    voc_vars = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16), voc_vars)

    @jax.jit
    def run(v, vv, key):
        out = model.apply(v, key, text, text_lens, speaker_ids,
                          accent_ids=accent_ids, f0_mean=f0_mean,
                          f0_std=f0_std, sigma=0.8, max_frames=MAX_FRAMES,
                          method=TTSModel.infer)
        # vocode in two groups: full-batch f32 activations exceed HBM, but
        # bf16 halves them; two groups leaves headroom
        mel_groups = out["mel"].reshape(2, 16, MAX_FRAMES, 80) \
            .astype(jnp.bfloat16)
        audio = jax.lax.map(lambda m: vocoder.apply(vv, m), mel_groups)
        audio = audio.astype(jnp.float32)
        # reduce in-graph; fetching the scalar forces real completion (the
        # axon relay's block_until_ready returns before execution finishes)
        return jnp.sum(audio)

    float(run(variables, voc_vars, jax.random.key(0)))   # compile + warm

    iters = 10
    t0 = time.perf_counter()
    for i in range(iters):
        float(run(variables, voc_vars, jax.random.key(i + 1)))
    dt = time.perf_counter() - t0

    frames = B * MAX_FRAMES * iters
    audio_seconds = frames * HOP / SR
    rtf = audio_seconds / dt
    print(json.dumps({
        "metric": "tts_text_to_audio_rtf_b32",
        "value": round(rtf, 2),
        "unit": "x_realtime_per_chip",
        "vs_baseline": round(rtf / 100.0, 3),
    }))


if __name__ == "__main__":
    main()
