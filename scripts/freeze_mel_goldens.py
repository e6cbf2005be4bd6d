"""Freeze mel-filterbank golden values for the tracked configs.

Generates assets/mel_basis_goldens.npz from a direct float64
transliteration of librosa 0.9.2 `librosa.filters.mel` (htk=False,
norm='slaney') — the basis the reference bakes into TacotronSTFT at
audio_processing.py:124-127. librosa itself is not installable in this
environment; this generator follows the published algorithm
(librosa/filters.py `mel`, librosa/core/convert.py `hz_to_mel`/`mel_to_hz`
/`fft_frequencies`/`mel_frequencies`) step by step, independently of
radmmm_tpu.ops.stft.mel_filterbank, so the committed goldens both pin the
library against drift (tests/test_stft.py) and cross-check the library's
own derivation.

Run: python scripts/freeze_mel_goldens.py   (rewrites the npz in assets/)
"""
import os

import numpy as np

ASSET = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "assets", "mel_basis_goldens.npz")

# (sampling_rate, n_fft, n_mels, fmin, fmax) for the tracked configs:
# 22.05 kHz (RADMMM_LJS_22khz_data_config.yaml:19-25, opensource 22 kHz)
# and 16 kHz (RADMMM_opensource_16khz_data_config.yaml:103-108).
CONFIGS = [
    (22050, 1024, 80, 0.0, 8000.0),
    (16000, 1024, 80, 0.0, 8000.0),
]


def hz_to_mel(frequencies, htk=False):
    """librosa.core.convert.hz_to_mel (0.9.2), f64."""
    frequencies = np.asanyarray(frequencies, dtype=np.float64)
    if htk:
        return 2595.0 * np.log10(1.0 + frequencies / 700.0)
    f_min = 0.0
    f_sp = 200.0 / 3
    mels = (frequencies - f_min) / f_sp
    min_log_hz = 1000.0
    min_log_mel = (min_log_hz - f_min) / f_sp
    logstep = np.log(6.4) / 27.0
    if frequencies.ndim:
        log_t = frequencies >= min_log_hz
        mels[log_t] = min_log_mel + np.log(
            frequencies[log_t] / min_log_hz) / logstep
    elif frequencies >= min_log_hz:
        mels = min_log_mel + np.log(frequencies / min_log_hz) / logstep
    return mels


def mel_to_hz(mels, htk=False):
    """librosa.core.convert.mel_to_hz (0.9.2), f64."""
    mels = np.asanyarray(mels, dtype=np.float64)
    if htk:
        return 700.0 * (10.0 ** (mels / 2595.0) - 1.0)
    f_min = 0.0
    f_sp = 200.0 / 3
    freqs = f_min + f_sp * mels
    min_log_hz = 1000.0
    min_log_mel = (min_log_hz - f_min) / f_sp
    logstep = np.log(6.4) / 27.0
    if mels.ndim:
        log_t = mels >= min_log_mel
        freqs[log_t] = min_log_hz * np.exp(
            logstep * (mels[log_t] - min_log_mel))
    elif mels >= min_log_mel:
        freqs = min_log_hz * np.exp(logstep * (mels - min_log_mel))
    return freqs


def fft_frequencies(sr, n_fft):
    """librosa.fft_frequencies: np.fft.rfftfreq(n_fft, 1/sr)."""
    return np.fft.rfftfreq(n=n_fft, d=1.0 / sr)


def mel_frequencies(n_mels, fmin, fmax, htk=False):
    min_mel = hz_to_mel(fmin, htk=htk)
    max_mel = hz_to_mel(fmax, htk=htk)
    mels = np.linspace(min_mel, max_mel, n_mels)
    return mel_to_hz(mels, htk=htk)


def librosa_mel(sr, n_fft, n_mels, fmin, fmax):
    """librosa.filters.mel (0.9.2), htk=False, norm='slaney', f64."""
    if fmax is None:
        fmax = float(sr) / 2
    weights = np.zeros((n_mels, 1 + n_fft // 2), dtype=np.float64)
    fftfreqs = fft_frequencies(sr=sr, n_fft=n_fft)
    mel_f = mel_frequencies(n_mels + 2, fmin=fmin, fmax=fmax)
    fdiff = np.diff(mel_f)
    ramps = np.subtract.outer(mel_f, fftfreqs)
    for i in range(n_mels):
        lower = -ramps[i] / fdiff[i]
        upper = ramps[i + 2] / fdiff[i + 1]
        weights[i] = np.maximum(0, np.minimum(lower, upper))
    # norm='slaney': divide triangles by their mel-band width
    enorm = 2.0 / (mel_f[2:n_mels + 2] - mel_f[:n_mels])
    weights *= enorm[:, np.newaxis]
    return weights


def main():
    out = {}
    for sr, n_fft, n_mels, fmin, fmax in CONFIGS:
        key = f"sr{sr}_fft{n_fft}_mel{n_mels}_fmin{int(fmin)}_fmax{int(fmax)}"
        out[key] = librosa_mel(sr, n_fft, n_mels, fmin, fmax)
        print(f"{key}: shape={out[key].shape} "
              f"sum={out[key].sum():.10f} max={out[key].max():.10f}")
    np.savez_compressed(ASSET, **out)
    print(f"wrote {ASSET}")


if __name__ == "__main__":
    main()
