"""Vocoder training loop + CLI glue (HiFi-GAN GAN training).

`python -m radmmm_tpu vocoder-fit -c data.yaml -c vocoder.yaml` trains a
HiFi-GAN on the configured dataset — the capability the reference only
vendors (as a separate WaveGlow/Tacotron2 repo, SURVEY.md §2.6).

Config shape:

    vocoder:
      generator: {upsample_rates: [8,8,2,2], ...}     # HiFiGANConfig fields
      train: {segment_size: 8192, learning_rate: 2e-4, ...}
      output_directory: ./output/vocoder
      max_steps: 1000000
      log_interval: 50
      iters_per_checkpoint: 5000
"""
from __future__ import annotations

import dataclasses
import os
import time
from typing import Any, Dict

import jax
import numpy as np
import orbax.checkpoint as ocp

from radmmm_tpu.data.loader import DataLoader
from radmmm_tpu.training.vocoder_train import (HiFiGANTrainer,
                                               VocoderTrainConfig,
                                               random_segments)
from radmmm_tpu.utils.logging import TrainLogger
from radmmm_tpu.vocoder.hifigan import HiFiGANConfig


def vocoder_fit(cfg: Dict[str, Any], dm) -> None:
    vc = cfg.get("vocoder", {})
    vocoder_type = vc.get("vocoder_type", "hifigan")
    feat_kwargs = dm.featurizer
    train_cfg = VocoderTrainConfig(
        sampling_rate=feat_kwargs.sampling_rate,
        filter_length=feat_kwargs.filter_length,
        hop_length=feat_kwargs.hop_length,
        n_mel_channels=feat_kwargs.mel.n_mel_channels,
        **vc.get("train", {}))
    out_dir = vc.get("output_directory", "./output/vocoder")
    max_steps = vc.get("max_steps", 1_000_000)
    log_interval = vc.get("log_interval", 50)
    iters_per_checkpoint = vc.get("iters_per_checkpoint", 5000)

    os.makedirs(out_dir, exist_ok=True)
    logger = TrainLogger(os.path.join(out_dir, "tb"))
    mgr = ocp.CheckpointManager(os.path.abspath(os.path.join(out_dir, "ckpt")),
                                options=ocp.CheckpointManagerOptions(
                                    create=True))

    dm.setup("fit")
    # raw-audio loader: skip device featurization; mel windows are computed
    # per segment by the vocoder trainer's mel fn
    loader = DataLoader(dm.trainset, dm.batch_size, shuffle=True,
                        featurizer=None, num_threads=dm.num_threads,
                        hop_length=train_cfg.hop_length)

    if vocoder_type == "waveglow":
        from radmmm_tpu.training.vocoder_train import WaveGlowTrainer
        trainer = WaveGlowTrainer(vc.get("generator", {}), train_cfg,
                                  sigma=vc.get("sigma", 1.0))
    else:
        gen_cfg = HiFiGANConfig(**{
            k: tuple(v) if isinstance(v, list) else v
            for k, v in vc.get("generator", {}).items()})
        trainer = HiFiGANTrainer(gen_cfg, train_cfg)
        # self-describing run dir: get_vocoder(checkpoint=<out_dir>) reads
        # this to rebuild the Generator for the native checkpoint
        import json
        with open(os.path.join(out_dir, "generator_config.json"), "w") as f:
            json.dump(dataclasses.asdict(gen_cfg), f, indent=1)
    rng = np.random.default_rng(0)
    state = None
    step = 0
    t_last = time.perf_counter()
    while step < max_steps:
        for host_batch in loader:
            batch = random_segments(host_batch["audio"],
                                    host_batch["audio_lengths"],
                                    trainer.mel_loss_fn,
                                    train_cfg.segment_size, rng)
            if state is None:
                state = trainer.init_state(jax.random.key(0), batch)
                restored = mgr.latest_step()
                if restored is not None:
                    payload = mgr.restore(
                        restored, args=ocp.args.StandardRestore(
                            dataclasses.asdict(state)))
                    state = type(state)(**payload)
                    step = int(restored)
                    print(f"resumed vocoder training from step {step}")
            state, metrics = trainer.train_step(state, batch)
            step += 1
            if step % log_interval == 0:
                m = {k: float(v) for k, v in metrics.items()}
                dt = time.perf_counter() - t_last
                m["steps_per_sec"] = log_interval / dt
                t_last = time.perf_counter()
                logger.scalars("vocoder", m, step)
                extra = (f"disc={m['disc_loss']:.3f} mel={m['gen_mel']:.3f} "
                         if "disc_loss" in m else "")
                print(f"vocoder step {step}: gen={m['gen_loss']:.3f} "
                      f"{extra}({m['steps_per_sec']:.2f} it/s)")
            if step % iters_per_checkpoint == 0 or step >= max_steps:
                mgr.save(step, args=ocp.args.StandardSave(
                    dataclasses.asdict(state)))
                mgr.wait_until_finished()
            if step >= max_steps:
                break
    print(f"vocoder training done at step {step}")
    return state
