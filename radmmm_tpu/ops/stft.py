"""STFT / mel-spectrogram feature extraction, XLA-native.

Behavioral parity target: the reference's conv1d-based STFT + librosa mel basis
+ log-clamp compression (reference: audio_processing.py:116-154, 192-255):
  - reflect-pad by n_fft//2 on both sides
  - hann window (periodic / fftbins=True), zero-center-padded to n_fft
  - magnitude = sqrt(re^2 + im^2) of an n_fft DFT at hop_length stride
  - mel basis = librosa.filters.mel(sr, n_fft, n_mels, fmin, fmax)
    (slaney-style triangular filters, slaney area normalization)
  - log(clamp(mel, min=1e-5))

Instead of a conv with an (n_fft*2, 1, n_fft) DFT basis (the reference's
cuDNN-friendly trick), we frame the signal and run a real FFT — XLA lowers
this to an efficient TPU FFT — then one (n_freq -> n_mels) matmul on the MXU.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def hann_window(win_length: int, dtype=np.float32) -> np.ndarray:
    """Periodic (fftbins=True) Hann window, == scipy.signal.get_window('hann', N)."""
    n = np.arange(win_length)
    return (0.5 - 0.5 * np.cos(2.0 * np.pi * n / win_length)).astype(dtype)


def _hz_to_mel_slaney(f):
    """Slaney-style Hz->mel (librosa default htk=False)."""
    f = np.asanyarray(f, dtype=np.float64)
    f_min, f_sp = 0.0, 200.0 / 3
    mels = (f - f_min) / f_sp
    min_log_hz = 1000.0
    min_log_mel = (min_log_hz - f_min) / f_sp
    logstep = np.log(6.4) / 27.0
    if f.ndim:
        log_t = f >= min_log_hz
        mels[log_t] = min_log_mel + np.log(f[log_t] / min_log_hz) / logstep
    elif f >= min_log_hz:
        mels = min_log_mel + np.log(f / min_log_hz) / logstep
    return mels


def _mel_to_hz_slaney(mels):
    mels = np.asanyarray(mels, dtype=np.float64)
    f_min, f_sp = 0.0, 200.0 / 3
    freqs = f_min + f_sp * mels
    min_log_hz = 1000.0
    min_log_mel = (min_log_hz - f_min) / f_sp
    logstep = np.log(6.4) / 27.0
    if mels.ndim:
        log_t = mels >= min_log_mel
        freqs[log_t] = min_log_hz * np.exp(logstep * (mels[log_t] - min_log_mel))
    elif mels >= min_log_mel:
        freqs = min_log_hz * np.exp(logstep * (mels - min_log_mel))
    return freqs


def mel_filterbank(sampling_rate: int, n_fft: int, n_mels: int,
                   fmin: float = 0.0, fmax: float | None = None,
                   dtype=np.float32) -> np.ndarray:
    """Slaney mel filterbank (n_mels, n_fft//2 + 1).

    Numerically matches librosa.filters.mel(sr, n_fft, n_mels, fmin, fmax)
    with librosa defaults htk=False, norm='slaney' (the basis the reference
    bakes into TacotronSTFT, audio_processing.py:124-127).
    """
    if fmax is None:
        fmax = float(sampling_rate) / 2
    n_freqs = n_fft // 2 + 1
    fft_freqs = np.linspace(0, float(sampling_rate) / 2, n_freqs, endpoint=True)

    min_mel = _hz_to_mel_slaney(fmin)
    max_mel = _hz_to_mel_slaney(fmax)
    mel_pts = _mel_to_hz_slaney(np.linspace(min_mel, max_mel, n_mels + 2))

    fdiff = np.diff(mel_pts)
    ramps = mel_pts[:, None] - fft_freqs[None, :]

    weights = np.zeros((n_mels, n_freqs), dtype=np.float64)
    for i in range(n_mels):
        lower = -ramps[i] / fdiff[i]
        upper = ramps[i + 2] / fdiff[i + 1]
        weights[i] = np.maximum(0, np.minimum(lower, upper))

    # slaney area normalization
    enorm = 2.0 / (mel_pts[2:n_mels + 2] - mel_pts[:n_mels])
    weights *= enorm[:, None]
    return weights.astype(dtype)


def frame_signal(y: jax.Array, n_fft: int, hop_length: int) -> jax.Array:
    """Reflect-pad by n_fft//2 and frame into (B, n_frames, n_fft).

    Matches the reference's F.pad(..., mode='reflect') + stride-hop conv
    (audio_processing.py:234-245): n_frames = 1 + T // hop_length.
    """
    pad = n_fft // 2
    y = jnp.pad(y, ((0, 0), (pad, pad)), mode="reflect")
    n_frames = 1 + (y.shape[1] - n_fft) // hop_length
    idx = (jnp.arange(n_frames) * hop_length)[:, None] + jnp.arange(n_fft)[None, :]
    return y[:, idx]


def dynamic_range_compression(x: jax.Array, clip_val: float = 1e-5) -> jax.Array:
    """log(clamp(x, min=clip_val)) (audio_processing.py:98-104)."""
    return jnp.log(jnp.clip(x, min=clip_val))


def dynamic_range_decompression(x: jax.Array) -> jax.Array:
    return jnp.exp(x)


class MelSpectrogram:
    """Batched waveform -> log-mel features. All static config resolved at build.

    Equivalent of TacotronSTFT.mel_spectrogram (audio_processing.py:137-154).
    Input: (B, T) float waveform in [-1, 1]. Output: (B, n_frames, n_mels)
    (channels-last; the reference returns (B, n_mels, n_frames)).
    """

    def __init__(self, filter_length: int = 1024, hop_length: int = 256,
                 win_length: int = 1024, n_mel_channels: int = 80,
                 sampling_rate: int = 22050, mel_fmin: float = 0.0,
                 mel_fmax: float | None = None):
        # Documented divergence: the reference *asserts*
        # win_length >= filter_length (audio_processing.py:214); librosa
        # accepts shorter windows (center-padded to n_fft), and so does this
        # build — the pad_center branch below handles it.
        self.filter_length = filter_length
        self.hop_length = hop_length
        self.win_length = win_length
        self.n_mel_channels = n_mel_channels
        self.sampling_rate = sampling_rate
        # window is computed at win_length then center-padded to filter_length
        win = hann_window(win_length)
        if win_length < filter_length:  # pad_center
            lpad = (filter_length - win_length) // 2
            win = np.pad(win, (lpad, filter_length - win_length - lpad))
        self.window = jnp.asarray(win)
        self.mel_basis = jnp.asarray(
            mel_filterbank(sampling_rate, filter_length, n_mel_channels,
                           mel_fmin, mel_fmax))

    @functools.partial(jax.jit, static_argnums=0)
    def stft_magnitude(self, y: jax.Array) -> jax.Array:
        """(B, T) -> (B, n_frames, n_fft//2+1) magnitude spectrogram."""
        frames = frame_signal(y, self.filter_length, self.hop_length)
        frames = frames * self.window[None, None, :]
        spec = jnp.fft.rfft(frames, n=self.filter_length, axis=-1)
        return jnp.abs(spec)

    @functools.partial(jax.jit, static_argnums=0)
    def __call__(self, y: jax.Array) -> jax.Array:
        """(B, T) waveform -> (B, n_frames, n_mels) log-mel."""
        mag = self.stft_magnitude(y)
        mel = jnp.einsum("btf,mf->btm", mag, self.mel_basis,
                         preferred_element_type=jnp.float32)
        return dynamic_range_compression(mel)

    def n_frames(self, n_samples: int) -> int:
        return 1 + n_samples // self.hop_length

    def stft(self, y: jax.Array):
        """(B, T) -> complex (B, n_frames, n_freq) (magnitude+phase source)."""
        frames = frame_signal(y, self.filter_length, self.hop_length)
        frames = frames * self.window[None, None, :]
        return jnp.fft.rfft(frames, n=self.filter_length, axis=-1)

    def istft(self, magnitude: jax.Array, phase: jax.Array) -> jax.Array:
        """Inverse STFT with window-sumsquare normalization.

        magnitude/phase: (B, n_frames, n_freq). Returns (B, T) with the
        center padding removed, matching STFT.inverse
        (audio_processing.py:257-286).
        """
        return istft_frames(magnitude, phase, self.filter_length,
                            self.hop_length, self.window)


def istft_frames(magnitude: jax.Array, phase: jax.Array, n_fft: int,
                 hop: int, window: jax.Array) -> jax.Array:
    """Overlap-add inverse STFT (free function: also the synthesis head of
    the iSTFTNet-style vocoder, vocoder/hifigan.py).

    magnitude/phase: (B, n_frames, n_fft//2+1). Returns (B, T) with the
    center padding removed.
    """
    # mag·e^{iφ} via explicit (re, im): complex exp is unimplemented on
    # some TPU runtimes; cos/sin + lax.complex lowers everywhere
    spec = jax.lax.complex(magnitude * jnp.cos(phase),
                           magnitude * jnp.sin(phase))
    frames = jnp.fft.irfft(spec, n=n_fft, axis=-1)     # (B, F, n_fft)
    frames = frames * window[None, None, :]
    B, n_frames_, _ = frames.shape
    T = n_fft + hop * (n_frames_ - 1)
    # overlap-add via scatter
    idx = (jnp.arange(n_frames_) * hop)[:, None] + jnp.arange(n_fft)[None]
    sig = jnp.zeros((B, T), frames.dtype)
    sig = sig.at[:, idx.reshape(-1)].add(
        frames.reshape(B, -1), unique_indices=False)
    # window sum-square envelope
    wss = jnp.zeros((T,), frames.dtype)
    wsq = (window ** 2).astype(frames.dtype)
    wss = wss.at[idx.reshape(-1)].add(
        jnp.broadcast_to(wsq, (n_frames_, n_fft)).reshape(-1))
    sig = jnp.where(wss > 1e-11, sig / jnp.maximum(wss, 1e-11), sig)
    pad = n_fft // 2
    return sig[:, pad:T - pad]


def griffin_lim(mel_or_mag: jax.Array, stft: "MelSpectrogram", rng,
                n_iters: int = 30) -> jax.Array:
    """Phase recovery by iterative STFT projection
    (audio_processing.py:79-95). mel_or_mag: (B, n_frames, n_freq)."""
    import jax as _jax
    phase = _jax.random.uniform(rng, mel_or_mag.shape, minval=-jnp.pi,
                                maxval=jnp.pi)
    signal = stft.istft(mel_or_mag, phase)
    for _ in range(n_iters):
        spec = stft.stft(signal)
        phase = jnp.arctan2(spec.imag, spec.real)
        signal = stft.istft(mel_or_mag, phase)
    return signal
