"""CLI: `python -m radmmm_tpu fit|predict -c cfg.yaml [-c more.yaml ...]
[--dotted.overrides=value ...]`.

Equivalent of tts_main.py:36-68 (RADTTSLightningCLI): multi-config
composition with later files overriding earlier ones, reference-format
`model:`/`data:`/`trainer:` sections (class_path/init_args), and dotted CLI
overrides. The data->model argument links (tts_main.py:48-61) are applied
after translation: sampling rate, symbol set, text-frontend flags flow from
the data section into the model/trainer configs, and n_text_tokens is
derived from the constructed symbol table.
"""
from __future__ import annotations

import argparse
import os
import sys
from typing import List

from radmmm_tpu.data.module import AudioDataModule
from radmmm_tpu.models.tts import TTSConfig
from radmmm_tpu.training.loop import Trainer, TrainerConfig
from radmmm_tpu.training.step import LossConfig
from radmmm_tpu.utils.config import (load_configs, apply_overrides,
                                     translate_reference_model_config,
                                     translate_reference_data_config)


def build_all(cfg: dict):
    translated = translate_reference_model_config(cfg)
    data_kwargs = translate_reference_data_config(cfg)

    dm = AudioDataModule(**data_kwargs)

    tts_kwargs = translated["tts"]
    # data -> model links (tts_main.py:48-61)
    tts_kwargs["n_text_tokens"] = dm.n_text_tokens
    tts_cfg = TTSConfig(**tts_kwargs)

    loss_cfg = LossConfig(**translated["loss"])

    trainer_section = cfg.get("trainer", {})
    run = translated["run"]
    # the reference's `trainer.devices` (DDP GPU count) maps to the data
    # axis; `n_data`/`n_model` select the mesh shape explicitly
    devices = trainer_section.get("devices")
    n_data = trainer_section.get(
        "n_data", devices if isinstance(devices, int) else None)
    kwargs = dict(
        n_data=n_data,
        n_model=trainer_section.get("n_model", 1),
        griffin_lim_iters=trainer_section.get("griffin_lim_iters", 30),
        output_directory=run["output_directory"],
        max_steps=trainer_section.get("max_steps", 1_000_000),
        max_epochs=trainer_section.get("max_epochs", 10_000),
        val_interval=trainer_section.get("val_check_interval", 500),
        iters_per_checkpoint=run["iters_per_checkpoint"],
        seed=run["seed"],
        learning_rate=translated["optim"]["learning_rate"],
        weight_decay=translated["optim"]["weight_decay"],
        optim_algo=translated["optim"]["optim_algo"],
        grad_clip_val=translated["optim"]["grad_clip_val"],
        use_syncbnorm=run["use_syncbnorm"],
        decoder_path=run["decoder_path"],
        encoders_path=run["encoders_path"],
        vocoder_type=run.get("vocoder_type", "hifigan"),
        vocoder_config_path=run["vocoder_config_path"],
        vocoder_checkpoint_path=run["vocoder_checkpoint_path"],
        sampling_rate=data_kwargs["featurizer_kwargs"]["sampling_rate"],
        hop_length=data_kwargs["featurizer_kwargs"]["hop_length"],
        conv_precision=cfg.get("model", {}).get("conv_precision", "f32"),
        prediction_output_dir=run["prediction_output_dir"],
        predict_mode=run["predict_mode"],
    )
    # any trainer key naming a TrainerConfig field passes through
    # (profile_dir, detect_anomaly, save_val_artifacts, val_prompts_path,
    # log_interval, sigma_infer, max_infer_frames, ...); explicit trainer
    # keys WIN over values translated from the model/data sections, so
    # `--trainer.prediction_output_dir=...`-style overrides take effect
    import dataclasses as _dc
    field_names = {f.name for f in _dc.fields(TrainerConfig)}
    kwargs.update({k: v for k, v in trainer_section.items()
                   if k in field_names})
    trainer_cfg = TrainerConfig(**kwargs)
    return dm, Trainer(tts_cfg, loss_cfg, trainer_cfg)


def main(argv: List[str] = None):
    argv = argv if argv is not None else sys.argv[1:]
    parser = argparse.ArgumentParser(prog="radmmm_tpu")
    parser.add_argument("subcommand",
                        choices=["fit", "predict", "vocoder-fit", "export"])
    parser.add_argument("-c", "--config", action="append", default=[],
                        help="YAML config (repeatable; later overrides)")
    parser.add_argument("--ckpt_path", default=None,
                        help="checkpoint to restore (reference README:70-80):"
                             " an integer step of this run, another run's "
                             "directory, a ckpt dir, or an explicit orbax "
                             "step dir like <run>/ckpt/9000")
    parser.add_argument("--distributed", action="store_true",
                        help="multi-host: jax.distributed.initialize() from "
                             "cluster env (the NCCL/DDP-launch equivalent)")
    args, unknown = parser.parse_known_args(argv)

    # persistent XLA compile cache: restart/resume skips recompiling the
    # train/val/predict programs (tens of seconds to minutes for the
    # flagship model). Opt-in via the standard JAX env var; on this jax
    # build the env var alone doesn't activate it — the config must be
    # set explicitly.
    cache_dir = os.environ.get("JAX_COMPILATION_CACHE_DIR")
    if cache_dir:
        import jax
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    if args.distributed:
        import jax
        jax.distributed.initialize()

    cfg = load_configs(args.config)
    cfg = apply_overrides(cfg, [u for u in unknown if "=" in u])

    if args.subcommand == "vocoder-fit":
        from radmmm_tpu.data.module import AudioDataModule
        from radmmm_tpu.training.vocoder_loop import vocoder_fit
        from radmmm_tpu.utils.config import translate_reference_data_config
        dm = AudioDataModule(**translate_reference_data_config(cfg))
        vocoder_fit(cfg, dm)
        return

    dm, trainer = build_all(cfg)
    if args.ckpt_path is not None:
        trainer.cfg.ckpt_path = args.ckpt_path
    if args.subcommand == "fit":
        trainer.fit(dm)
    elif args.subcommand == "export":
        ex = cfg.get("export", {})
        buckets = ex.get("buckets")
        if isinstance(buckets, str):  # "--export.buckets=8x96,4x48,1x32"
            buckets = [tuple(int(d) for d in b.split("x"))
                       for b in buckets.split(",") if b]
        elif buckets:
            buckets = [tuple(int(d) for d in b) for b in buckets]
        frame_buckets = ex.get("frame_buckets")
        if isinstance(frame_buckets, str):  # "--export.frame_buckets=192,384,800"
            frame_buckets = [int(f) for f in frame_buckets.split(",") if f]
        trainer.export(
            ex.get("path", os.path.join(trainer.cfg.output_directory,
                                        "tts_export.bin")),
            batch_size=ex.get("batch_size", 8),
            max_text=ex.get("max_text", 96),
            use_vocoder=ex.get("use_vocoder", True),
            buckets=buckets, frame_buckets=frame_buckets)
    else:
        trainer.predict(dm)


if __name__ == "__main__":
    main()
