"""Freeze librosa-0.9.2 `pyin` golden F0 tracks for a committed utterance.

The reference extracts F0/voicing with `librosa.pyin`
(/root/reference/data.py:349-361: frame_length=1024, win_length=512,
hop_length=256, center=True, f0[~voiced]=0).  librosa is not installable in
this environment, so — exactly like scripts/freeze_mel_goldens.py — this
generator is a direct float64 transliteration of the published algorithm
(librosa/core/pitch.py `pyin`, `_cumulative_mean_normalized_difference`,
`_parabolic_interpolation`; librosa/sequence.py `transition_local`,
`transition_loop`, `viterbi`; librosa/util/utils.py `localmin`), written
independently of radmmm_tpu.data.pitch.  The committed goldens pin the
device pYIN (tests/test_pitch.py) to librosa's behavior on a realistic
utterance: voicing F1 + cents error tolerances, not bit equality — the
device implementation documents its approximations (20 thresholds, 5
bins/semitone, separable max-plus transitions).

Run: python scripts/freeze_pyin_goldens.py   (rewrites assets/pyin_goldens.npz)
"""
import os

import numpy as np
import scipy.signal
import scipy.stats

ASSET = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "assets", "pyin_goldens.npz")

SR = 22050
FRAME_LENGTH = 1024
WIN_LENGTH = 512
HOP_LENGTH = 256
FMIN, FMAX = 80.0, 640.0


# ---------------------------------------------------------------------------
# librosa 0.9.2 transliteration (float64, numpy)
# ---------------------------------------------------------------------------

def _cumulative_mean_normalized_difference(y_frames, frame_length,
                                           win_length, min_period,
                                           max_period):
    """librosa/core/pitch.py:_cumulative_mean_normalized_difference."""
    # Autocorrelation via rFFT cross-correlation with the reversed head.
    a = np.fft.rfft(y_frames, frame_length, axis=0)
    b = np.fft.rfft(y_frames[win_length::-1, :], frame_length, axis=0)
    acf_frames = np.fft.irfft(a * b, frame_length, axis=0)[win_length:]
    acf_frames[np.abs(acf_frames) < 1e-6] = 0

    # Energy terms: energy of y[tau : tau + win_length].
    energy_frames = np.cumsum(y_frames ** 2, axis=0)
    energy_frames = (energy_frames[win_length:, :]
                     - energy_frames[:-win_length, :])
    energy_frames[np.abs(energy_frames) < 1e-6] = 0

    # Difference function.
    yin_frames = energy_frames[0, :] + energy_frames - 2 * acf_frames

    # Cumulative-mean normalization over tau in [min_period, max_period].
    yin_numerator = yin_frames[min_period:max_period + 1, :]
    tau_range = np.arange(1, max_period + 1)[:, None]
    cumulative_mean = (np.cumsum(yin_frames[1:max_period + 1, :], axis=0)
                       / tau_range)
    yin_denominator = cumulative_mean[min_period - 1:max_period, :]
    tiny = np.finfo(yin_denominator.dtype).tiny
    return yin_numerator / (yin_denominator + tiny)


def _parabolic_interpolation(yin_frames):
    """librosa/core/pitch.py:_parabolic_interpolation."""
    parabolic_shifts = np.zeros_like(yin_frames)
    parabola_a = (yin_frames[:-2, :] + yin_frames[2:, :]
                  - 2 * yin_frames[1:-1, :]) / 2
    parabola_b = (yin_frames[2:, :] - yin_frames[:-2, :]) / 2
    with np.errstate(divide="ignore", invalid="ignore"):
        shifts = -parabola_b / (2 * parabola_a)
    shifts[~np.isfinite(shifts)] = 0
    parabolic_shifts[1:-1, :] = shifts
    parabolic_shifts[np.abs(parabolic_shifts) > 1] = 0
    return parabolic_shifts


def _localmin(x):
    """librosa/util/utils.py:localmin along axis 0 (edge-padded)."""
    x_pad = np.pad(x, ((1, 1), (0, 0)), mode="edge")
    return (x < x_pad[:-2]) & (x <= x_pad[2:])


def _transition_local(n_states, width):
    """librosa/sequence.py:transition_local (triangle window, wrap=False):
    row i is a length-`width` triangular window centered on state i,
    truncated at the state boundaries and row-normalized."""
    win = scipy.signal.windows.triang(width)
    half = width // 2
    t = np.zeros((n_states, n_states))
    for i in range(n_states):
        lo = max(0, i - half)
        hi = min(n_states, i + half + 1)
        t[i, lo:hi] = win[lo - i + half:hi - i + half]
        t[i] /= t[i].sum()
    return t


def _viterbi(prob, transition, p_init):
    """librosa/sequence.py:viterbi — max-product decode in log space."""
    tiny = np.finfo(prob.dtype).tiny
    log_trans = np.log(transition + tiny)
    log_prob = np.log(prob.T + tiny)          # (n_frames, n_states)
    n_frames, n_states = log_prob.shape
    value = np.zeros((n_frames, n_states))
    ptr = np.zeros((n_frames, n_states), dtype=int)
    value[0] = log_prob[0] + np.log(p_init + tiny)
    for t in range(1, n_frames):
        trans_out = value[t - 1][:, None] + log_trans
        ptr[t] = np.argmax(trans_out, axis=0)
        value[t] = log_prob[t] + trans_out[ptr[t], np.arange(n_states)]
    states = np.zeros(n_frames, dtype=int)
    states[-1] = np.argmax(value[-1])
    for t in range(n_frames - 2, -1, -1):
        states[t] = ptr[t + 1, states[t + 1]]
    return states


def pyin(y, fmin, fmax, sr, frame_length, win_length, hop_length,
         n_thresholds=100, beta_parameters=(2, 18), boltzmann_parameter=2,
         resolution=0.1, max_transition_rate=35.92, switch_prob=0.01,
         no_trough_prob=0.01, center=True):
    """librosa/core/pitch.py:pyin (0.9.2), fill_na handling as in the
    reference (data.py:357: f0[~voiced_mask] = 0)."""
    if center:
        y = np.pad(y, frame_length // 2, mode="reflect")
    n_frames = 1 + (len(y) - frame_length) // hop_length
    idx = (np.arange(n_frames) * hop_length)[:, None] \
        + np.arange(frame_length)[None, :]
    y_frames = y[idx].T.astype(np.float64)     # (frame_length, n_frames)

    min_period = max(int(np.floor(sr / fmax)), 1)
    max_period = min(int(np.ceil(sr / fmin)), frame_length - win_length - 1)
    yin_frames = _cumulative_mean_normalized_difference(
        y_frames, frame_length, win_length, min_period, max_period)
    parabolic_shifts = _parabolic_interpolation(yin_frames)

    thresholds = np.linspace(0, 1, n_thresholds + 1)
    beta_cdf = scipy.stats.beta.cdf(thresholds, *beta_parameters)
    beta_probs = np.diff(beta_cdf)

    yin_probs = np.zeros_like(yin_frames)
    for i, yin_frame in enumerate(yin_frames.T):
        is_trough = _localmin(yin_frames[:, i:i + 1])[:, 0]
        is_trough[0] = yin_frame[0] < yin_frame[1]
        (trough_index,) = np.nonzero(is_trough)
        if len(trough_index) == 0:
            continue
        trough_heights = yin_frame[trough_index]
        trough_thresholds = trough_heights[:, None] < thresholds[None, 1:]
        trough_positions = np.cumsum(trough_thresholds, axis=0) - 1
        n_troughs = np.count_nonzero(trough_thresholds, axis=0)
        trough_prior = scipy.stats.boltzmann.pmf(
            trough_positions, boltzmann_parameter, n_troughs)
        trough_prior[~trough_thresholds] = 0
        probs = np.sum(trough_prior * beta_probs, axis=1)
        global_min = np.argmin(trough_heights)
        n_thresholds_below_min = np.count_nonzero(
            ~trough_thresholds[global_min, :])
        probs[global_min] += no_trough_prob * np.sum(
            beta_probs[:n_thresholds_below_min])
        yin_probs[trough_index, i] = probs

    (yin_period, frame_index) = np.nonzero(yin_probs)
    period_candidates = (min_period + yin_period
                         + parabolic_shifts[yin_period, frame_index])
    f0_candidates = sr / period_candidates

    n_bins_per_semitone = int(np.ceil(1.0 / resolution))
    n_pitch_bins = int(np.floor(12 * n_bins_per_semitone
                                * np.log2(fmax / fmin))) + 1

    observation_probs = np.zeros((2 * n_pitch_bins, yin_frames.shape[1]))
    bin_index = 12 * n_bins_per_semitone * np.log2(f0_candidates / fmin)
    bin_index = np.clip(np.round(bin_index), 0, n_pitch_bins).astype(int)
    observation_probs[bin_index, frame_index] = \
        yin_probs[yin_period, frame_index]
    voiced_prob = np.clip(
        np.sum(observation_probs[:n_pitch_bins, :], axis=0), 0, 1)
    observation_probs[n_pitch_bins:, :] = (1 - voiced_prob) / n_pitch_bins

    max_semitones_per_frame = round(max_transition_rate * 12
                                    * hop_length / sr)
    transition_width = max_semitones_per_frame * n_bins_per_semitone + 1
    transition = _transition_local(n_pitch_bins, transition_width)
    t_switch = np.array([[1 - switch_prob, switch_prob],
                         [switch_prob, 1 - switch_prob]])
    transition = np.kron(t_switch, transition)

    p_init = np.zeros(2 * n_pitch_bins)
    p_init[n_pitch_bins:] = 1 / n_pitch_bins

    states = _viterbi(observation_probs, transition, p_init)

    freqs = fmin * 2.0 ** (np.arange(n_pitch_bins)
                           / (12 * n_bins_per_semitone))
    f0 = freqs[states % n_pitch_bins]
    voiced_flag = states < n_pitch_bins
    f0 = np.where(voiced_flag, f0, 0.0)
    return f0, voiced_flag, voiced_prob


# ---------------------------------------------------------------------------
# Golden utterance: deterministic pseudo-speech with known voicing structure
# ---------------------------------------------------------------------------

def make_utterance(sr=SR, seconds=2.2, seed=1234):
    """Silence | voiced glide+vibrato | fricative noise | voiced steady |
    silence — covers every state transition the HMM must make."""
    rng = np.random.default_rng(seed)
    t = np.arange(int(seconds * sr)) / sr
    audio = np.zeros_like(t)

    def voiced(t0, t1, f0_fn, amp=0.35):
        seg = (t >= t0) & (t < t1)
        ts = t[seg] - t0
        f0 = f0_fn(ts)
        phase = 2 * np.pi * np.cumsum(f0) / sr
        # a few harmonics through a formant-ish weighting + shimmer
        x = np.zeros_like(ts)
        for h, w in ((1, 1.0), (2, 0.6), (3, 0.45), (4, 0.2), (5, 0.1)):
            x += w * np.sin(h * phase)
        x *= amp * (1 + 0.05 * rng.standard_normal(len(ts)))
        # fade edges to avoid clicks
        fade = min(int(0.01 * sr), len(ts) // 4)
        env = np.ones_like(ts)
        env[:fade] = np.linspace(0, 1, fade)
        env[-fade:] = np.linspace(1, 0, fade)
        audio[seg] += x * env
        return f0

    # glide 120 -> 240 Hz with 5 Hz vibrato
    voiced(0.25, 1.0, lambda ts: 120.0 * 2 ** (ts / 0.75)
           * (1 + 0.02 * np.sin(2 * np.pi * 5 * ts)))
    # unvoiced fricative: band-limited noise burst
    seg = (t >= 1.05) & (t < 1.35)
    noise = rng.standard_normal(seg.sum())
    b, a = scipy.signal.butter(4, [3000 / (sr / 2), 8000 / (sr / 2)],
                               btype="band")
    audio[seg] += 0.12 * scipy.signal.lfilter(b, a, noise)
    # steady 180 Hz vowel
    voiced(1.45, 2.0, lambda ts: np.full_like(ts, 180.0))
    return audio.astype(np.float32)


def main():
    audio = make_utterance()
    f0, voiced_flag, voiced_prob = pyin(
        audio.astype(np.float64), FMIN, FMAX, SR,
        FRAME_LENGTH, WIN_LENGTH, HOP_LENGTH)
    n_voiced = int(voiced_flag.sum())
    print(f"{len(f0)} frames, {n_voiced} voiced; "
          f"f0 range {f0[voiced_flag].min():.1f}-{f0[voiced_flag].max():.1f}"
          f" Hz")
    np.savez_compressed(
        ASSET, audio=audio, f0=f0.astype(np.float32),
        voiced_flag=voiced_flag.astype(np.float32),
        voiced_prob=voiced_prob.astype(np.float32),
        params=np.array([SR, FRAME_LENGTH, WIN_LENGTH, HOP_LENGTH,
                         FMIN, FMAX], np.float64))
    print("wrote", ASSET)


if __name__ == "__main__":
    main()
