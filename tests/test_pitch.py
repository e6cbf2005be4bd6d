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


# ---------------------------------------------------------------------------
# pYIN HMM Viterbi smoothing (librosa.pyin equivalent; VERDICT round-1 #6)
# ---------------------------------------------------------------------------

def _glide(sr=22050, dur=1.0):
    """Gliding tone 150->300 Hz with 5 Hz vibrato + 2nd harmonic; returns
    (wave, frame_times -> true instantaneous F0 interpolator)."""
    t = np.arange(int(dur * sr)) / sr
    phase = 2 * np.pi * (150 * t + 75 * t ** 2) + 0.3 * np.sin(
        2 * np.pi * 5 * t)
    true_f = 150 + 150 * t + 0.3 * 5 * np.cos(2 * np.pi * 5 * t)
    wav = (0.5 * np.sin(phase) + 0.35 * np.sin(2 * phase)).astype(np.float32)
    return wav, t, true_f


def test_pyin_tracks_glide_with_vibrato():
    """Median error < 25 cents against the analytic instantaneous F0 of a
    glide+vibrato (the frozen golden is the known ground truth), and no
    octave jumps anywhere on the voiced trajectory."""
    from radmmm_tpu.data.pitch import pyin_f0
    sr = 22050
    wav, t, true_f = _glide(sr)
    f0, v, _ = pyin_f0(jnp.asarray(wav[None]), sampling_rate=sr)
    f0, v = np.asarray(f0)[0], np.asarray(v)[0]
    ft = np.arange(f0.shape[0]) * 256 / sr
    valid = (ft > 0.05) & (ft < 0.95)
    tf = np.interp(ft, t, true_f)
    m = valid & (v > 0)
    assert m.mean() > 0.8
    cents = 1200 * np.abs(np.log2(f0[m] / tf[m]))
    assert np.median(cents) < 25, np.median(cents)
    jumps = np.abs(np.diff(np.log2(f0[m])))
    assert jumps.max() < 0.2, jumps.max()


def test_pyin_removes_octave_errors_vs_yin(rng):
    """Signal whose fundamental periodically collapses (only the 2nd
    harmonic remains): per-frame YIN octave-jumps on >30% of frames; the
    Viterbi-smoothed track stays on the fundamental."""
    from radmmm_tpu.data.pitch import pyin_f0
    sr, f = 22050, 200.0
    t = np.arange(sr) / sr
    a1 = np.clip(np.sin(2 * np.pi * 4 * t), 0, 1)
    wav = (0.45 * a1 * np.sin(2 * np.pi * f * t)
           + 0.45 * np.sin(4 * np.pi * f * t)
           + 0.02 * rng.standard_normal(t.size)).astype(np.float32)[None]
    ft = np.arange(1 + t.size // 256) * 256 / sr
    valid = (ft > 0.05) & (ft < 0.95)

    def octave_err_frac(fn):
        f0, v, _ = fn(jnp.asarray(wav), sampling_rate=sr)
        f0, v = np.asarray(f0)[0], np.asarray(v)[0]
        m = valid & (v > 0)
        return (np.abs(np.log2(f0[m] / f)) > 0.4).mean()

    assert octave_err_frac(pyin_f0) == 0.0
    assert octave_err_frac(yin_f0) > 0.3  # the failure mode being fixed


def test_pyin_no_voicing_flicker():
    """Tone + silence segments: the voiced mask must be contiguous (few
    transitions), not flickering at segment boundaries."""
    from radmmm_tpu.data.pitch import pyin_f0
    sr = 22050
    sig = np.concatenate([tone(220.0, dur=0.4), np.zeros(sr // 4, np.float32),
                          tone(330.0, dur=0.4)])[None]
    f0, v, _ = pyin_f0(jnp.asarray(sig), sampling_rate=sr)
    v = np.asarray(v)[0]
    assert np.abs(np.diff(v)).sum() <= 4  # ~2 real transitions + padding
    assert (np.asarray(f0)[0][v == 0] == 0).all()


def test_pyin_matches_librosa_goldens():
    """Device pYIN vs frozen librosa-0.9.2 goldens (assets/pyin_goldens.npz,
    scripts/freeze_pyin_goldens.py — the transliterate->freeze->commit
    pattern of the mel goldens). Tolerance-based: the device implementation
    documents its approximations (20 thresholds, 5 bins/semitone, separable
    transitions), so we assert voicing F1 and cents agreement on the
    utterance, not bit equality. Reference call: data.py:349-361."""
    import os
    from radmmm_tpu.data.pitch import pyin_f0
    path = os.path.join(os.path.dirname(__file__), "..", "assets",
                        "pyin_goldens.npz")
    g = np.load(path)
    sr, frame_length, _, hop_length, fmin, fmax = g["params"]
    f0, voiced, _ = pyin_f0(
        jnp.asarray(g["audio"])[None, :], sampling_rate=int(sr),
        frame_length=int(frame_length), hop_length=int(hop_length),
        f0_min=float(fmin), f0_max=float(fmax))
    f0 = np.asarray(f0)[0]
    voiced = np.asarray(voiced)[0] > 0
    g_voiced = g["voiced_flag"] > 0
    assert f0.shape == g["f0"].shape

    # voicing agreement: F1 over the librosa-voiced frames
    tp = float((voiced & g_voiced).sum())
    prec = tp / max(voiced.sum(), 1)
    rec = tp / max(g_voiced.sum(), 1)
    f1 = 2 * prec * rec / max(prec + rec, 1e-9)
    assert f1 > 0.90, (prec, rec, f1)

    # pitch agreement in cents where both agree the frame is voiced
    both = voiced & g_voiced
    cents = 1200 * np.abs(np.log2(f0[both] / g["f0"][both]))
    assert np.median(cents) < 20, np.median(cents)
    assert np.mean(cents) < 35, np.mean(cents)
