"""F0 extraction on synthetic signals with known pitch."""
import jax.numpy as jnp
import numpy as np

from radmmm_tpu.data.pitch import yin_f0


def tone(freq, sr=22050, dur=0.7, amp=0.5):
    t = np.arange(int(sr * dur)) / sr
    # add harmonics so it is voice-like
    return (amp * (np.sin(2 * np.pi * freq * t)
                   + 0.4 * np.sin(4 * np.pi * freq * t)
                   + 0.2 * np.sin(6 * np.pi * freq * t))).astype(np.float32)


def test_f0_on_pure_tones():
    sr = 22050
    sigs = np.stack([tone(110.0), tone(220.0), tone(440.0)])
    f0, voiced, p_voiced = yin_f0(jnp.asarray(sigs), sampling_rate=sr)
    f0 = np.asarray(f0); voiced = np.asarray(voiced)
    for i, want in enumerate([110.0, 220.0, 440.0]):
        mid = f0[i, 10:-10]
        vm = voiced[i, 10:-10] > 0
        assert vm.mean() > 0.9, f"tone {want} mostly voiced"
        med = np.median(mid[vm])
        assert abs(med - want) / want < 0.03, (want, med)


def test_silence_and_noise_unvoiced(rng):
    sr = 22050
    silence = np.zeros((1, sr // 2), np.float32)
    noise = rng.standard_normal((1, sr // 2)).astype(np.float32) * 0.3
    f0_s, v_s, p_s = yin_f0(jnp.asarray(silence), sampling_rate=sr)
    assert np.asarray(v_s).mean() == 0.0
    assert np.asarray(f0_s).max() == 0.0
    f0_n, v_n, p_n = yin_f0(jnp.asarray(noise), sampling_rate=sr)
    assert np.asarray(v_n).mean() < 0.4  # noise mostly unvoiced


def test_f0_zero_when_unvoiced(rng):
    sr = 22050
    sig = np.concatenate([tone(220.0, dur=0.3),
                          np.zeros(sr // 4, np.float32)])[None]
    f0, voiced, _ = yin_f0(jnp.asarray(sig), sampling_rate=sr)
    f0 = np.asarray(f0)
    assert (f0[np.asarray(voiced) == 0] == 0).all()
    assert f0.shape[1] == 1 + sig.shape[1] // 256
