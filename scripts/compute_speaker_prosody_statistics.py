"""Per-speaker prosody statistics (F0 / energy) over a dataset.

Working replacement for the reference's scripts/compute_speaker_prosody_
statistics.py (which imports a nonexistent `train` module and is broken
as-is — SURVEY.md §2.9). Computes per-speaker f0 mean/std/median (linear and
log) over voiced frames within [f0_min, f0_max], and energy mean/std over
valid frames, writing one JSON per speaker plus collated_stats.json in the
format the training pipeline's `speaker_stats_path` consumes.

Usage:
    python scripts/compute_speaker_prosody_statistics.py \
        -c configs/my_data.yaml -o stats_out/ [--batch-size 16]
"""
from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("-c", "--config", action="append", required=True)
    ap.add_argument("-o", "--output-path", required=True)
    ap.add_argument("--batch-size", type=int, default=16)
    ap.add_argument("--f0-min", type=float, default=80.0)
    ap.add_argument("--f0-max", type=float, default=660.0)
    ap.add_argument("--overwrite", action="store_true")
    args = ap.parse_args()

    from radmmm_tpu.data.module import AudioDataModule
    from radmmm_tpu.data.loader import DataLoader
    from radmmm_tpu.utils.config import (load_configs,
                                         translate_reference_data_config)

    cfg = load_configs(args.config)
    dk = translate_reference_data_config(cfg)
    # stats are computed from raw (linear-Hz) F0: disable the log transform
    dk["featurizer_kwargs"]["use_log_f0"] = False
    dk["dataset_kwargs"]["speaker_stats_path"] = None
    dk["dataset_kwargs"]["use_wave_augmentations"] = False
    dm = AudioDataModule(**dk)
    dm.setup("fit")

    os.makedirs(args.output_path, exist_ok=True)
    collated = {}
    for speaker, sid in sorted(dm.trainset.speaker_ids.items()):
        save_path = os.path.join(args.output_path, f"{speaker}.json")
        if os.path.exists(save_path) and not args.overwrite:
            print(f"skipping {speaker}: exists at {save_path}")
            collated[speaker] = json.load(open(save_path))
            continue
        indices = [i for i, u in enumerate(dm.trainset.data)
                   if u.speaker == speaker]
        if not indices:
            continue
        f0_all, energy_all = [], []
        loader = DataLoader(dm.trainset, args.batch_size, shuffle=False,
                            featurizer=dm.featurizer, num_threads=4)
        loader.batcher = iter_batches(indices, args.batch_size)
        for batch in loader:
            f0 = np.asarray(batch["f0"])
            voiced = np.asarray(batch["voiced_mask"]) > 0
            lens = np.asarray(batch["output_lengths"])
            energy = np.asarray(batch["energy_avg"])
            for b in range(f0.shape[0]):
                v = voiced[b, :lens[b]]
                f = f0[b, :lens[b]][v]
                f = f[(f > args.f0_min) & (f < args.f0_max)]
                f0_all.append(f)
                energy_all.append(energy[b, :lens[b]])
        f0_cat = np.concatenate(f0_all) if f0_all else np.zeros(1)
        en_cat = np.concatenate(energy_all) if energy_all else np.zeros(1)
        log_f0 = np.log(np.maximum(f0_cat, 1e-5))
        stats = {
            "f0_median": float(np.median(f0_cat)),
            "f0_mean": float(f0_cat.mean()),
            "f0_std": float(f0_cat.std()),
            "log_f0_median": float(np.median(log_f0)),
            "log_f0_mean": float(log_f0.mean()),
            "log_f0_std": float(log_f0.std()),
            "energy_mean": float(en_cat.mean()),
            "energy_std": float(en_cat.std()),
        }
        with open(save_path, "w") as f:
            json.dump(stats, f, indent=2)
        collated[speaker] = stats
        print(f"{speaker}: {stats}")

    with open(os.path.join(args.output_path, "collated_stats.json"),
              "w") as f:
        json.dump(collated, f, indent=2)
    print(f"wrote {len(collated)} speakers to {args.output_path}")


class iter_batches:
    """Fixed index batches in place of the loader's BucketBatcher."""

    def __init__(self, indices, batch_size):
        self.indices = indices
        self.batch_size = batch_size

    def __iter__(self):
        for i in range(0, len(self.indices), self.batch_size):
            yield self.indices[i:i + self.batch_size]

    def __len__(self):
        return (len(self.indices) + self.batch_size - 1) // self.batch_size


if __name__ == "__main__":
    main()
