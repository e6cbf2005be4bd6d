"""Collation + bucketing + device-side batch featurization.

Replaces DataCollate (data.py:616-790) and the per-item CPU DSP. Host-side
`collate_host` pads raw audio/text into bucketed static shapes (bounding the
jit recompile count, SURVEY.md §7.3 "variable lengths without dynamic
shapes"); `Featurizer.__call__` then computes mel / F0 / voicing / energy /
alignment priors for the whole batch in one jitted TPU computation.

The reference sorts batches by text length for packed LSTMs
(data.py:630-632); masked scans don't need sorting, so order is preserved.
"""
from __future__ import annotations

import functools
from typing import Any, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from radmmm_tpu.data.pitch import yin_f0, pyin_f0
from radmmm_tpu.ops.priors import beta_binomial_prior
from radmmm_tpu.ops.stft import MelSpectrogram


def round_up(n: int, multiple: int) -> int:
    return ((n + multiple - 1) // multiple) * multiple


def collate_host(items: Sequence[Optional[Dict[str, Any]]],
                 hop_length: int = 256, audio_frames_multiple: int = 64,
                 text_multiple: int = 16,
                 pad_to: Optional[tuple] = None
                 ) -> Optional[Dict[str, np.ndarray]]:
    """Pad a list of dataset items into bucketed numpy arrays.

    None items (broken audio) are dropped, as in the reference
    (data.py:624). ``pad_to=(mel_frames, text_tokens)`` pins the padded
    shape (multi-host: every process must produce the same global batch
    shape — the loader schedules shapes from filelist metadata); items
    exceeding it are clipped to the scheduled bucket.
    """
    items = [x for x in items if x is not None]
    if not items:
        return None
    B = len(items)
    audio_lens = np.array([len(x["audio"]) for x in items], np.int32)
    text_lens = np.array([len(x["text_encoded"]) for x in items], np.int32)

    if pad_to is not None:
        max_frames, T_text = int(pad_to[0]), int(pad_to[1])
        T_audio = max_frames * hop_length
        audio_lens = np.minimum(audio_lens, T_audio)
        text_lens = np.minimum(text_lens, T_text)
    else:
        # bucket: pad audio so mel frames land on a multiple of
        # audio_frames_multiple (mel frames = 1 + T // hop)
        max_frames = round_up(1 + int(audio_lens.max()) // hop_length,
                              audio_frames_multiple)
        T_audio = max_frames * hop_length
        T_text = round_up(int(text_lens.max()), text_multiple)

    audio = np.zeros((B, T_audio), np.float32)
    text = np.zeros((B, T_text), np.int32)
    for i, x in enumerate(items):
        audio[i, :audio_lens[i]] = x["audio"][:audio_lens[i]]
        text[i, :text_lens[i]] = x["text_encoded"][:text_lens[i]]

    out_extra = {}
    tracks = [x.get("cached_f0") for x in items]
    if all(t is not None for t in tracks):
        # precomputed (3, F) [f0, voiced, p_voiced] tracks -> the featurizer
        # skips its pYIN graph for this batch (data/f0_cache.py)
        cf = np.zeros((B, 3, max_frames), np.float32)
        for i, t in enumerate(tracks):
            n = min(t.shape[1], max_frames)
            cf[i, :, :n] = t[:, :n]
        out_extra["cached_f0"] = cf

    return {
        **out_extra,
        "audio": audio,
        "audio_lengths": audio_lens,
        "text": text,
        "input_lengths": text_lens,
        "speaker_ids": np.array([x["speaker_id"] for x in items], np.int32),
        "accent_ids": np.array([x["accent_id"] for x in items], np.int32),
        "speaker_f0_mean": np.array(
            [x["speaker_f0_mean"] for x in items], np.float32),
        "speaker_f0_std": np.array(
            [x["speaker_f0_std"] for x in items], np.float32),
        "speaker_energy_mean": np.array(
            [x["speaker_energy_mean"] for x in items], np.float32),
        "speaker_energy_std": np.array(
            [x["speaker_energy_std"] for x in items], np.float32),
        "audiopaths": [x["audiopath"] for x in items],
        "text_raw": [x["text_raw"] for x in items],
        "language": [x["language"] for x in items],
        "idx": np.array([x["idx"] for x in items], np.int32),
    }


class Featurizer:
    """Batched on-device feature extraction -> train-step batch dict."""

    def __init__(self, filter_length=1024, hop_length=256, win_length=1024,
                 n_mel_channels=80, sampling_rate=22050, mel_fmin=0.0,
                 mel_fmax=8000.0, f0_min=80.0, f0_max=640.0,
                 use_log_f0=True, use_scaled_energy=True,
                 use_attn_prior_masking=True,
                 betabinom_scaling_factor=0.05,
                 mel_noise_scale=0.0, distance_tx_unvoiced=False,
                 f0_method="pyin", seed=0):
        self.mel = MelSpectrogram(filter_length, hop_length, win_length,
                                  n_mel_channels, sampling_rate, mel_fmin,
                                  mel_fmax)
        self.hop_length = hop_length
        self.filter_length = filter_length
        self.sampling_rate = sampling_rate
        self.f0_min, self.f0_max = f0_min, f0_max
        self.use_log_f0 = use_log_f0
        self.use_scaled_energy = use_scaled_energy
        self.use_attn_prior_masking = use_attn_prior_masking
        self.betabinom_scaling_factor = betabinom_scaling_factor
        self.mel_noise_scale = mel_noise_scale
        self.distance_tx_unvoiced = distance_tx_unvoiced
        # 'pyin' (HMM-Viterbi-smoothed, librosa.pyin equivalent) or 'yin'
        # (per-frame observations only)
        self.f0_method = f0_method
        self.seed = seed
        self._n_calls = 0  # host-side counter -> fresh noise key per batch
        # resume/rank decorrelation (see set_noise_base): the noise key
        # folds in (process_index, base, counter) so ranks never share a
        # noise pattern and resumed runs don't replay the sequence from 0
        self._noise_base = 0

    def set_noise_base(self, step: int):
        """Re-key the mel-noise stream from a trainer step (called on
        checkpoint resume so the counter-derived key sequence continues
        instead of replaying from 0)."""
        self._noise_base = int(step)
        self._n_calls = 0

    @functools.partial(jax.jit, static_argnums=(0, 4))
    def _featurize(self, audio, audio_lens, text_lens, max_text: int,
                   noise_key, cached_f0=None):
        mel = self.mel(audio)                         # (B, F, n_mels)
        # truncate the +1 frame so mel frames == bucket multiple
        mel = mel[:, :audio.shape[1] // self.hop_length]
        mel_lens = jnp.minimum(1 + audio_lens // self.hop_length,
                               mel.shape[1]).astype(jnp.int32)

        if cached_f0 is not None:
            # precomputed track (data/f0_cache.py): skip the pYIN graph
            f0 = cached_f0[:, 0, :mel.shape[1]]
            voiced = cached_f0[:, 1, :mel.shape[1]]
            p_voiced = cached_f0[:, 2, :mel.shape[1]]
        else:
            f0_fn = pyin_f0 if self.f0_method == "pyin" else yin_f0
            f0, voiced, p_voiced = f0_fn(
                audio, sampling_rate=self.sampling_rate,
                frame_length=self.filter_length, hop_length=self.hop_length,
                f0_min=self.f0_min, f0_max=self.f0_max)
            f0 = f0[:, :mel.shape[1]]
            voiced = voiced[:, :mel.shape[1]]
            p_voiced = p_voiced[:, :mel.shape[1]]
        if self.use_log_f0:
            f0 = jnp.where(f0 >= self.f0_min, jnp.log(jnp.maximum(f0, 1.0)),
                           0.0)                       # data.py:321-327
        if self.distance_tx_unvoiced:
            # f0 -= log(distance to nearest voiced frame), clamped at 0
            # (data.py:528-532); 1-D distance transform via two cumulative
            # scans over the frame axis
            unvoiced = f0 <= 0.0
            T = f0.shape[1]
            idx = jnp.arange(T, dtype=jnp.float32)[None, :]
            big = jnp.float32(T)
            last_voiced = jax.lax.associative_scan(
                jnp.maximum, jnp.where(~unvoiced, idx, -big), axis=1)
            next_voiced = -jax.lax.associative_scan(
                jnp.maximum, jnp.where(~unvoiced, -idx, -2 * big), axis=1,
                reverse=True)
            dist = jnp.minimum(idx - last_voiced, next_voiced - idx)
            dist = jnp.clip(dist, 0.0, big)
            dmap = jnp.maximum(jnp.log(jnp.maximum(dist, 1e-6)), 0.0)
            f0 = f0 - jnp.where(unvoiced, dmap, 0.0)
        if self.mel_noise_scale > 0:
            # data.py:374-375; per-batch key threaded from the host-side
            # call counter, so the same batch gets different noise each epoch
            mel = mel + jax.random.normal(noise_key, mel.shape) \
                * self.mel_noise_scale

        energy = mel.mean(axis=-1)                    # data.py:363-366
        if self.use_scaled_energy:
            energy = (energy + 20.0) / 20.0

        frame_mask = (jnp.arange(mel.shape[1])[None, :]
                      < mel_lens[:, None]).astype(mel.dtype)
        mel = mel * frame_mask[..., None]
        f0 = f0 * frame_mask
        voiced = voiced * frame_mask
        energy = energy * frame_mask

        if self.use_attn_prior_masking:
            prior = beta_binomial_prior(
                text_lens, mel_lens, max_text=max_text,
                max_mel=mel.shape[1],
                scaling_factor=self.betabinom_scaling_factor)
        else:
            prior = jnp.ones((audio.shape[0], mel.shape[1], max_text))
        return mel, mel_lens, f0, voiced, p_voiced, energy, prior

    @functools.partial(jax.jit, static_argnums=0)
    def _dequantize(self, audio_i16):
        return audio_i16.astype(jnp.float32) / 32768.0

    def noise_key_for_step(self, step):
        """Deterministic mel-noise key for global trainer step `step` (host
        int or traced scalar): fold_in(key(seed), process_index, step).
        The megastep scan and its per-batch fallback both key the stream on
        the global step, so the same data sees ONE augmentation sequence
        regardless of group scheduling, and resume at step N continues the
        stream exactly (no set_noise_base needed on this path)."""
        key = jax.random.fold_in(jax.random.key(self.seed),
                                 jax.process_index())
        return jax.random.fold_in(key, step)

    def _next_noise_key(self):
        if self.mel_noise_scale > 0:
            noise_key = jax.random.key(self.seed)
            for n in (jax.process_index(), self._noise_base, self._n_calls):
                noise_key = jax.random.fold_in(noise_key, n)
            self._n_calls += 1
            return noise_key
        # unused by the jitted graph; avoid per-batch dispatches
        if not hasattr(self, "_null_key"):
            self._null_key = jax.random.key(self.seed)
        return self._null_key

    def raw_arrays(self, host_batch: Dict[str, Any]) -> Dict[str, np.ndarray]:
        """Host collate dict -> the pure-array inputs of the device
        featurization graph (strings dropped, audio quantized to int16: wav
        sources are int16 so the /32768 round-trip is exact, augmented audio
        re-quantizes at -90 dB, and host->device bytes drop 4x vs f32)."""
        raw = {k: v for k, v in host_batch.items()
               if isinstance(v, np.ndarray) and k != "audio"}
        raw["audio_i16"] = np.clip(np.rint(host_batch["audio"] * 32768.0),
                                   -32768, 32767).astype(np.int16)
        return raw

    def featurize_raw(self, raw: Dict[str, Any], noise_key) -> Dict[str, Any]:
        """Pure device featurization: raw_arrays() pytree -> train-step
        batch. Traceable — the megastep (training/step.py
        make_train_megastep) calls it inside lax.scan so K batches
        featurize+train in ONE dispatch."""
        audio = self._dequantize(raw["audio_i16"])
        cached = raw.get("cached_f0")
        mel, mel_lens, f0, voiced, p_voiced, energy, prior = self._featurize(
            audio, raw["audio_lengths"], raw["input_lengths"],
            int(raw["text"].shape[1]), noise_key, cached)
        batch = {k: v for k, v in raw.items()
                 if k not in ("audio_i16", "cached_f0")}
        batch["audio"] = audio
        batch.update(mel=mel, output_lengths=mel_lens, f0=f0,
                     voiced_mask=voiced, p_voiced=p_voiced,
                     energy_avg=energy, attn_prior=prior)
        return batch

    def __call__(self, host_batch: Dict[str, Any]) -> Dict[str, Any]:
        """host collate dict -> full train-step batch (device arrays)."""
        raw = {k: (jnp.asarray(v) if isinstance(v, np.ndarray) else v)
               for k, v in self.raw_arrays(host_batch).items()}
        batch = self.featurize_raw(raw, self._next_noise_key())
        for k in ("audiopaths", "text_raw", "language"):
            if k in host_batch:
                batch[k] = host_batch[k]
        return batch


class BucketBatcher:
    """Length-bucketed batch index sampler: groups utterances of similar
    mel length so padded shapes stay in a small static set, while batch
    *membership* reshuffles every epoch within length windows (the
    reference reshuffles membership fully each epoch; windows keep the
    shape-bucket benefit)."""

    def __init__(self, lengths: Sequence[float], batch_size: int,
                 shuffle: bool = True, seed: int = 0,
                 bucket_window_batches: int = 8):
        self.lengths = np.asarray(lengths)
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.rng = np.random.default_rng(seed)
        self.window = batch_size * max(1, bucket_window_batches)

    def __iter__(self):
        order = np.argsort(self.lengths, kind="stable")
        if self.shuffle:
            for s in range(0, len(order), self.window):
                self.rng.shuffle(order[s:s + self.window])
        batches = [order[i:i + self.batch_size]
                   for i in range(0, len(order), self.batch_size)]
        if self.shuffle:
            self.rng.shuffle(batches)
        for b in batches:
            yield list(map(int, b))

    def __len__(self):
        return (len(self.lengths) + self.batch_size - 1) // self.batch_size
