"""Waveform augmentations: formant / pitch / duration scaling.

The reference shells out to the Praat C++ engine ("Change speaker" via
praat-parselmouth, wave_transforms.py:34-160) on CPU workers. That binary
is not available here; this module builds the same three controls from two
batched, jittable DSP primitives — a phase-vocoder time stretch and a
band-limited resampler — so augmentation can run on device:

* duration scale d   : phase-vocoder time stretch by d (pitch unchanged)
* pitch scale p      : stretch by p then resample back to length (pitch and
                       formants move together)
* formant scale f    : cepstral-liftered spectral-envelope frequency warp —
                       the harmonic (excitation) structure keeps its spacing
                       so pitch is preserved while formant peaks move by f;
                       the core of the accent-disentanglement augmentation.

Augmented copies get fresh speaker ids: id + n_speakers * (1 + aug_index)
(matching the speaker-table expansion, tts_lightning_modules.py:127-131).
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from radmmm_tpu.ops.stft import hann_window


def resample_linear(x: jax.Array, ratio: float, out_len: int) -> jax.Array:
    """(B, T) -> (B, out_len): playback-rate change by `ratio`
    (ratio > 1 reads faster: higher pitch, shorter signal)."""
    T = x.shape[1]
    pos = jnp.arange(out_len) * ratio
    i0 = jnp.clip(jnp.floor(pos).astype(jnp.int32), 0, T - 1)
    i1 = jnp.clip(i0 + 1, 0, T - 1)
    frac = (pos - i0.astype(pos.dtype))[None, :]
    valid = (pos < T - 1)[None, :]
    out = x[:, i0] * (1 - frac) + x[:, i1] * frac
    return out * valid


def _stft_frames(x, n_fft, hop, window):
    pad = n_fft // 2
    x = jnp.pad(x, ((0, 0), (pad, pad)), mode="reflect")
    n_frames = 1 + (x.shape[1] - n_fft) // hop
    idx = (jnp.arange(n_frames) * hop)[:, None] + jnp.arange(n_fft)[None, :]
    return jnp.fft.rfft(x[:, idx] * window[None, None, :], axis=-1)


def phase_vocoder_stretch(x: jax.Array, rate: float, out_len: int,
                          n_fft: int = 1024, hop: int = 256) -> jax.Array:
    """Time-stretch (B, T) by 1/rate (rate > 1 -> shorter output), constant
    pitch, classic phase-vocoder phase propagation."""
    window = jnp.asarray(hann_window(n_fft))
    spec = _stft_frames(x, n_fft, hop, window)        # (B, F, bins)
    B, n_frames, n_bins = spec.shape

    out_frames = max(int(np.ceil(out_len / hop)) + 1, 2)
    t = jnp.arange(out_frames) * rate
    i0 = jnp.clip(jnp.floor(t).astype(jnp.int32), 0, n_frames - 2)
    frac = (t - i0)[None, :, None]

    mag0 = jnp.abs(spec[:, i0])
    mag1 = jnp.abs(spec[:, i0 + 1])
    mag = (1 - frac) * mag0 + frac * mag1

    # phase advance accumulation
    omega = 2.0 * jnp.pi * jnp.arange(n_bins) * hop / n_fft
    phase = jnp.angle(spec)
    dphase = phase[:, 1:] - phase[:, :-1] - omega[None, None, :]
    dphase = dphase - 2 * jnp.pi * jnp.round(dphase / (2 * jnp.pi))
    inst = omega[None, None, :] + dphase                # (B, F-1, bins)
    inst_sel = inst[:, jnp.clip(i0, 0, n_frames - 2)]   # (B, out_F, bins)

    def acc(carry, k):
        ph = carry + inst_sel[:, k]
        return ph, ph

    ph0 = phase[:, 0]
    _, phases = jax.lax.scan(acc, ph0, jnp.arange(out_frames))
    phases = jnp.swapaxes(phases, 0, 1)                 # (B, out_F, bins)

    out_spec = mag * jnp.exp(1j * phases)
    frames = jnp.fft.irfft(out_spec, n=n_fft, axis=-1) * window[None, None, :]

    T_out = n_fft + hop * (out_frames - 1)
    idx = (jnp.arange(out_frames) * hop)[:, None] + jnp.arange(n_fft)[None, :]
    sig = jnp.zeros((B, T_out)).at[:, idx.reshape(-1)].add(
        frames.reshape(B, -1))
    wss = jnp.zeros((T_out,)).at[idx.reshape(-1)].add(
        jnp.broadcast_to(window ** 2, (out_frames, n_fft)).reshape(-1))
    sig = jnp.where(wss > 1e-9, sig / jnp.maximum(wss, 1e-9), sig)
    pad = n_fft // 2
    sig = sig[:, pad:]
    return sig[:, :out_len] if sig.shape[1] >= out_len else jnp.pad(
        sig, ((0, 0), (0, out_len - sig.shape[1])))


def pitch_shift(x: jax.Array, ratio: float, out_len: int) -> jax.Array:
    """Shift pitch (and formants) by `ratio`, duration preserved:
    time-stretch to T*ratio at constant pitch, then resample by ratio."""
    T = x.shape[1]
    stretched = phase_vocoder_stretch(x, 1.0 / ratio, int(T * ratio) + 2)
    return resample_linear(stretched, ratio, out_len)


def _spectral_envelope(log_mag: jax.Array, n_fft: int,
                       sampling_rate: float = 22050.0,
                       f0_min: float = 80.0, f0_max: float = 640.0,
                       n_iter: int = 3) -> jax.Array:
    """Pitch-adaptive true-envelope estimate of (B, F, bins) log spectra.

    A fixed cepstral lifter either misses sharp formants (too coarse) or
    leaks harmonic structure (too fine, breaking pitch preservation for
    high-F0 voices). Instead: (a) locate each frame's pitch quefrency from
    the cepstrum and lifter just below it, (b) iterate the true-envelope
    update env <- smooth(max(log_mag, env)) (Roebel & Rodet 2005) so the
    envelope rides the harmonic PEAKS rather than averaging through them —
    which is what makes a warped envelope actually move a 60 Hz-bandwidth
    F1 by the requested ratio (asserted in
    tests/test_wave_transforms.py::test_formant_shift_ratio_matches_praat_semantics).
    """
    n_bins = log_mag.shape[-1]
    q = jnp.arange(n_fft)

    def smooth(lm, keep):
        ceps = jnp.fft.irfft(lm, n=n_fft, axis=-1)
        return jnp.fft.rfft(ceps * keep, n=n_fft,
                            axis=-1).real[..., :n_bins]

    ceps0 = jnp.fft.irfft(log_mag, n=n_fft, axis=-1)
    qlo = max(2, int(sampling_rate / f0_max))
    qhi = min(n_fft // 2, int(sampling_rate / f0_min) + 1)
    pitch_q = qlo + jnp.argmax(ceps0[..., qlo:qhi], axis=-1)   # (B, F)
    lifter = jnp.clip(0.75 * pitch_q.astype(jnp.float32),
                      16.0, 0.45 * n_fft)[..., None]
    keep = ((q[None, None, :] < lifter)
            | (q[None, None, :] > n_fft - lifter)).astype(log_mag.dtype)
    env = smooth(log_mag, keep)
    for _ in range(n_iter):
        env = smooth(jnp.maximum(log_mag, env), keep)
    return env


def formant_shift(x: jax.Array, ratio: float, out_len: int,
                  n_fft: int = 1024, hop: int = 256,
                  sampling_rate: float = 22050.0) -> jax.Array:
    """Shift formants by `ratio` with pitch preserved (Praat
    formant_shift_ratio equivalent).

    Per STFT frame the log-magnitude is split into a spectral envelope
    (pitch-adaptive true-envelope estimate) and the harmonic excitation
    residual; only the envelope is frequency-warped, so harmonic spacing
    (pitch) stays put while formant peaks move by `ratio`.
    """
    window = jnp.asarray(hann_window(n_fft))
    spec = _stft_frames(x, n_fft, hop, window)
    mag = jnp.maximum(jnp.abs(spec), 1e-8)
    phase = jnp.angle(spec)
    n_bins = mag.shape[-1]

    log_mag = jnp.log(mag)
    env_log = _spectral_envelope(log_mag, n_fft, sampling_rate)
    excitation_log = log_mag - env_log

    # envelope warped: env'(f) = env(f / ratio)
    pos = jnp.arange(n_bins) / ratio
    i0 = jnp.clip(jnp.floor(pos).astype(jnp.int32), 0, n_bins - 1)
    i1 = jnp.clip(i0 + 1, 0, n_bins - 1)
    frac = pos - i0
    env_warp = (env_log[..., i0] * (1 - frac[None, None, :])
                + env_log[..., i1] * frac[None, None, :])

    new_mag = jnp.exp(excitation_log + env_warp)
    out_spec = new_mag * jnp.exp(1j * phase)
    frames = jnp.fft.irfft(out_spec, n=n_fft, axis=-1) * window[None, None, :]
    B, n_frames_, _ = frames.shape
    T_out = n_fft + hop * (n_frames_ - 1)
    idx = (jnp.arange(n_frames_) * hop)[:, None] + jnp.arange(n_fft)[None, :]
    sig = jnp.zeros((B, T_out)).at[:, idx.reshape(-1)].add(
        frames.reshape(B, -1))
    wss = jnp.zeros((T_out,)).at[idx.reshape(-1)].add(
        jnp.broadcast_to(window ** 2, (n_frames_, n_fft)).reshape(-1))
    sig = jnp.where(wss > 1e-9, sig / jnp.maximum(wss, 1e-9), sig)
    pad = n_fft // 2
    sig = sig[:, pad:]
    return sig[:, :out_len] if sig.shape[1] >= out_len else jnp.pad(
        sig, ((0, 0), (0, out_len - sig.shape[1])))


def duration_scale(x: jax.Array, factor: float, out_len: int) -> jax.Array:
    """Praat duration_factor: output is `factor`x as long, same pitch."""
    return phase_vocoder_stretch(x, 1.0 / factor, out_len)


@dataclasses.dataclass
class WaveAugmentations:
    """Probabilistic per-item augmentation config (wave_transforms.py:82-160).

    aug_probability: chance an item is augmented; each enabled transform
    samples its factor uniformly from [lo, hi].
    """
    aug_probability: float = 0.4
    use_formant_scaling: bool = True
    formant_range: tuple = (0.875, 1.125)
    use_pitch_scaling: bool = False
    pitch_range: tuple = (0.9, 1.1)
    use_duration_scaling: bool = False
    duration_range: tuple = (0.9, 1.1)
    n_augmentations: int = 1
    # reference schema (wave_transforms.py:82-160): a categorical choice
    # over fixed (type, scale) pairs; entry 0 is conventionally "none".
    aug_types: Optional[list] = None
    aug_scales: Optional[list] = None
    aug_probabilities: Optional[list] = None
    aug_languages_applicable: Optional[list] = None
    num_aug_in_batch: int = 0
    randomize_transform: bool = False

    @classmethod
    def from_config(cls, cfg: Optional[dict]):
        """Accepts both this class's kwargs and the reference's
        wave_aug_config schema (aug_types/aug_scales/aug_probabilities...)."""
        cfg = dict(cfg or {})
        if cfg.get("aug_types"):
            n = sum(1 for t in cfg["aug_types"] if t != "none")
            cfg.setdefault("n_augmentations", n)
        return cls(**cfg)

    def print_settings(self):
        print(f"WaveAugmentations({dataclasses.asdict(self)})")

    def sample(self, rng: np.random.Generator, language: Optional[str] = None):
        """Host-side decision: (apply?, aug_index, factors dict)."""
        if self.aug_types:
            if (self.aug_languages_applicable is not None
                    and language is not None
                    and language not in self.aug_languages_applicable):
                return False, 0, {}
            p = np.asarray(self.aug_probabilities, np.float64)
            choice = int(rng.choice(len(self.aug_types), p=p / p.sum()))
            if self.aug_types[choice] == "none":
                return False, 0, {}
            scale = float(self.aug_scales[choice])
            if self.randomize_transform:
                scale = float(rng.uniform(min(scale, 1.0), max(scale, 1.0)))
            kind = self.aug_types[choice].replace("scale_", "")
            # aug ids count only the non-"none" entries, in order
            aug_index = sum(1 for t in self.aug_types[:choice + 1]
                            if t != "none")
            return True, aug_index, {kind: scale}
        if rng.uniform() > self.aug_probability:
            return False, 0, {}
        aug_index = int(rng.integers(1, self.n_augmentations + 1))
        factors = {}
        if self.use_formant_scaling:
            factors["formant"] = float(rng.uniform(*self.formant_range))
        if self.use_pitch_scaling:
            factors["pitch"] = float(rng.uniform(*self.pitch_range))
        if self.use_duration_scaling:
            factors["duration"] = float(rng.uniform(*self.duration_range))
        return True, aug_index, factors

    def max_duration_factor(self) -> float:
        """Largest duration-stretch any sampled augmentation can apply
        (>= 1.0). Host-side batch-shape scheduling must scale filelist
        durations by this so post-augmentation audio still fits the
        scheduled pad_to shape."""
        f = 1.0
        if self.aug_types:
            for t, s in zip(self.aug_types, self.aug_scales or []):
                if t != "none" and t.replace("scale_", "") == "duration":
                    f = max(f, float(s))
        elif self.use_duration_scaling:
            f = max(f, float(max(self.duration_range)))
        return f

    def apply(self, audio: np.ndarray, factors: dict) -> np.ndarray:
        """Apply sampled factors to (T,) audio on host via the jitted DSP.

        Pinned to the CPU backend: augmentation is loader-thread data work —
        dispatching it to the accelerator would steal device time from the
        train step (and the relay-attached TPU lacks the irfft kernels the
        envelope estimate uses)."""
        with jax.default_device(jax.local_devices(backend="cpu")[0]):
            x = jnp.asarray(audio)[None, :]
            T = x.shape[1]
            if "formant" in factors and abs(factors["formant"] - 1.0) > 1e-4:
                x = formant_shift(x, factors["formant"], T)
            if "pitch" in factors and abs(factors["pitch"] - 1.0) > 1e-4:
                x = pitch_shift(x, factors["pitch"], T)
            if "duration" in factors and abs(factors["duration"] - 1.0) > 1e-4:
                T2 = int(T * factors["duration"])
                x = duration_scale(x, factors["duration"], T2)
            return np.asarray(x[0])

    def remap_speaker_id(self, speaker_id: int, aug_index: int,
                         n_speakers: int) -> int:
        """Augmented copies get distinct speaker ids
        (tts_lightning_modules.py:127-131)."""
        return speaker_id + n_speakers * aug_index
