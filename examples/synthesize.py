"""Minimal inference walkthrough (the reference's inference.ipynb as a
script): load a trained run, synthesize prompts, write wavs.

    python examples/synthesize.py \
        -c configs/radmmm_train.yaml -c configs/ljs_22khz_data.yaml \
        -c configs/radmmm_model.yaml -c configs/radmmm_attributes.yaml \
        --prompts prompts.json --out out_wavs/
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("-c", "--config", action="append", required=True)
    ap.add_argument("--prompts", required=True,
                    help="JSON transcript: [{script, spk_id, emotion, "
                         "language, [decoder_spk_id, ...]}]")
    ap.add_argument("--out", default=None)
    ap.add_argument("--sigma", type=float, default=0.8)
    ap.add_argument("--max-frames", type=int, default=1024)
    args = ap.parse_args()

    from radmmm_tpu.training.cli import build_all
    from radmmm_tpu.utils.config import load_configs

    cfg = load_configs(args.config)
    dm, trainer = build_all(cfg)
    dm.inference_transcript = args.prompts
    trainer.cfg.sigma_infer = args.sigma
    trainer.cfg.max_infer_frames = args.max_frames
    if args.out:
        trainer.cfg.prediction_output_dir = args.out
    paths = trainer.predict(dm)
    for p in paths:
        print(p)


if __name__ == "__main__":
    main()
