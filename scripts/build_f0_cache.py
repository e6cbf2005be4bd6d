"""Precompute per-utterance F0 (pYIN on device) into a native cache.

The TPU-batched equivalent of the reference's lazy librosa.pyin disk cache
(data.py:491-527). Training with `--data.init_args.f0_cache_path=<path>`
then skips the per-batch pYIN graph; augmented items derive their track
analytically from the cache (data/f0_cache.py).

Usage:
    python scripts/build_f0_cache.py -c configs/my_data.yaml -o cache/f0
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("-c", "--config", action="append", required=True)
    ap.add_argument("-o", "--output", required=True)
    ap.add_argument("--batch-size", type=int, default=8)
    ap.add_argument("--include-val", action=argparse.BooleanOptionalAction,
                    default=True,
                    help="also cache validation utterances "
                         "(--no-include-val for a train-only cache)")
    args = ap.parse_args()

    from radmmm_tpu.data.f0_cache import build_f0_cache
    from radmmm_tpu.data.module import AudioDataModule
    from radmmm_tpu.utils.config import (load_configs,
                                         translate_reference_data_config)

    cfg = load_configs(args.config)
    dk = translate_reference_data_config(cfg)
    # the cache stores un-augmented tracks; also drop any existing cache
    # pointers so we read the original audio
    dk["dataset_kwargs"].update(use_wave_augmentations=False,
                                f0_cache_path=None)
    dm = AudioDataModule(**dk)
    dm.setup("fit")

    fk = dk["featurizer_kwargs"]
    kwargs = dict(batch_size=args.batch_size,
                  filter_length=fk.get("filter_length", 1024),
                  hop_length=fk.get("hop_length", 256),
                  f0_min=fk.get("f0_min", 80.0),
                  f0_max=fk.get("f0_max", 640.0),
                  f0_method=fk.get("f0_method", "pyin"))
    datasets = [dm.trainset]
    if dm.valset is not None and args.include_val:
        datasets.append(dm.valset)
    n = build_f0_cache(datasets, args.output, **kwargs)
    print(f"wrote {n} F0 records to {args.output}")


if __name__ == "__main__":
    main()
