"""Per-utterance F0 cache: precompute pYIN on device, store host-side.

The reference disk-caches librosa.pyin per utterance because it is slow
(data.py:491-527, `*.pt` files next to the wavs). Here the equivalent is a
batch-precompute pass over the corpus — pYIN runs on the TPU in bucketed
batches — written into the mmap'd native FeatureCache (cpp/feature_cache.cc)
keyed ``f0::<audiopath>`` as a (3, n_frames) float32 array
[f0_hz, voiced, p_voiced].

Training then skips the per-batch pYIN graph entirely. Augmented items
transform the cached track analytically (exact for this framework's DSP
augmentations): pitch-scale multiplies F0, duration-scale resamples the
frame axis, formant-shift leaves F0 untouched (data/dataset.py).
"""
from __future__ import annotations

from typing import Optional

import numpy as np

from radmmm_tpu.data.collate import round_up


def f0_key(audiopath: str) -> str:
    return f"f0::{audiopath}"


def build_f0_cache(datasets, out_path: str, batch_size: int = 8,
                   filter_length: int = 1024, hop_length: int = 256,
                   f0_min: float = 80.0, f0_max: float = 640.0,
                   f0_method: str = "pyin", num_threads: int = 4,
                   frames_multiple: int = 64) -> int:
    """Compute F0 for every utterance of the given dataset(s) into one
    cache file at ``out_path``.

    Datasets must be constructed WITHOUT augmentations (the cache stores
    the un-augmented track; augmented copies are derived at load time).
    Returns the number of records written.
    """
    import jax.numpy as jnp
    from concurrent.futures import ThreadPoolExecutor

    from radmmm_tpu.data.pitch import pyin_f0, yin_f0
    from radmmm_tpu.native import FeatureCacheWriter

    if not isinstance(datasets, (list, tuple)):
        datasets = [datasets]
    f0_fn = pyin_f0 if f0_method == "pyin" else yin_f0

    n_written = 0
    seen = set()
    with FeatureCacheWriter(out_path) as writer, \
            ThreadPoolExecutor(num_threads) as pool:
        for dataset in datasets:
            assert dataset.augmentations is None, \
                "build the F0 cache from an un-augmented dataset"
            sr = dataset.sampling_rate
            # length-sorted -> tight buckets, few compiled shapes
            order = sorted(range(len(dataset.data)),
                           key=lambda i: dataset.data[i].duration)
            for s in range(0, len(order), batch_size):
                idxs = order[s:s + batch_size]
                items = [x for x in pool.map(dataset.__getitem__, idxs)
                         if x is not None
                         and x["audiopath"] not in seen]
                if not items:
                    continue
                lens = [len(x["audio"]) for x in items]
                frames = round_up(1 + max(lens) // hop_length,
                                  frames_multiple)
                T = frames * hop_length
                audio = np.zeros((len(items), T), np.float32)
                for i, x in enumerate(items):
                    audio[i, :lens[i]] = x["audio"][:T]
                f0, voiced, pvd = f0_fn(
                    jnp.asarray(audio), sampling_rate=sr,
                    frame_length=filter_length, hop_length=hop_length,
                    f0_min=f0_min, f0_max=f0_max)
                f0, voiced, pvd = (np.asarray(f0), np.asarray(voiced),
                                   np.asarray(pvd))
                for i, x in enumerate(items):
                    n = min(1 + lens[i] // hop_length, f0.shape[1])
                    track = np.stack([f0[i, :n], voiced[i, :n],
                                      pvd[i, :n]])
                    writer.put_array(f0_key(x["audiopath"]),
                                     track.astype(np.float32))
                    seen.add(x["audiopath"])
                    n_written += 1
    return n_written


def transform_cached_f0(track: np.ndarray, factors: dict) -> np.ndarray:
    """Analytically apply wave-augmentation factors to a cached (3, F)
    [f0, voiced, p_voiced] track (see data/wave_transforms.py):
    pitch p scales F0 by p; duration d resamples the frame axis to F*d;
    formant shift leaves F0 unchanged."""
    out = track
    p = factors.get("pitch", 1.0)
    if abs(p - 1.0) > 1e-4:
        out = out.copy()
        out[0] = out[0] * p
    d = factors.get("duration", 1.0)
    if abs(d - 1.0) > 1e-4:
        F = out.shape[1]
        F2 = max(1, int(round(F * d)))
        src = np.clip(np.round(np.arange(F2) / d).astype(np.int64), 0, F - 1)
        out = out[:, src]
    return out
