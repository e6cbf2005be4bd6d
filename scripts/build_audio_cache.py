"""Build an mmap'd audio cache for a dataset's filelists.

Native replacement for preparing the reference's LMDB audio store: reads
every wav referenced by the data config and writes one record per audiopath
into a FeatureCache (cpp/feature_cache.cc). Training then uses
`--data.audio_cache_path=<path>` for zero-copy reads.

Usage:
    python scripts/build_audio_cache.py -c configs/my_data.yaml -o cache/audio
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("-c", "--config", action="append", required=True)
    ap.add_argument("-o", "--output", required=True)
    args = ap.parse_args()

    from radmmm_tpu.data.dataset import load_filelists, load_wav
    from radmmm_tpu.native import FeatureCacheWriter
    from radmmm_tpu.utils.config import (load_configs,
                                         translate_reference_data_config)

    cfg = load_configs(args.config)
    dk = translate_reference_data_config(cfg)
    utts = load_filelists(dk["train_config"],
                          dk["dataset_kwargs"]["use_multilingual_model"])
    if dk.get("val_config"):
        utts += load_filelists(dk["val_config"],
                               dk["dataset_kwargs"]["use_multilingual_model"])

    os.makedirs(os.path.dirname(os.path.abspath(args.output)), exist_ok=True)
    n_ok = 0
    with FeatureCacheWriter(args.output) as w:
        for u in utts:
            try:
                audio, sr = load_wav(u.audiopath)
            except Exception as e:
                print(f"skipping {u.audiopath}: {e}")
                continue
            w.put_array(u.audiopath, audio.astype(np.float32))
            n_ok += 1
    print(f"cached {n_ok}/{len(utts)} utterances to {args.output}.dat")


if __name__ == "__main__":
    main()
