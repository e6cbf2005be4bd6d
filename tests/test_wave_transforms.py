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
