"""Batched F0 / voicing extraction (YIN + pYIN-style thresholds), on device.

Replaces the reference's librosa.pyin call (data.py:349-361), which runs
per-utterance on CPU workers and is disk-cached because it is so slow.
Here the whole batch is one XLA computation: FFT-based difference function,
cumulative-mean normalization, threshold sweep for voicing probability,
parabolic interpolation for sub-sample lag accuracy.

This is pYIN's per-frame observation model (Mauch & Dixon 2014) without the
HMM Viterbi smoothing — adequate for the F0-conditioning channel; unvoiced
frames are zeroed exactly like the reference (data.py:357).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from radmmm_tpu.ops.stft import frame_signal


@functools.partial(jax.jit, static_argnames=(
    "sampling_rate", "frame_length", "hop_length", "f0_min", "f0_max"))
def yin_f0(audio: jax.Array, sampling_rate: int = 22050,
           frame_length: int = 1024, hop_length: int = 256,
           f0_min: float = 80.0, f0_max: float = 640.0):
    """audio: (B, T) in [-1, 1]. Returns (f0, voiced_mask, p_voiced),
    each (B, n_frames) with n_frames = 1 + T // hop_length."""
    win = frame_length // 2
    frames = frame_signal(audio, frame_length, hop_length)  # (B, F, frame)
    B, n_frames, _ = frames.shape

    # difference function d(tau) = sum_j (x_j - x_{j+tau})^2 for j < win
    # = e0 + e_tau - 2 * corr(tau), via rFFT cross-correlation
    n_fft = 2 * frame_length
    spec = jnp.fft.rfft(frames, n=n_fft, axis=-1)
    head = frames[..., :win]
    head_spec = jnp.fft.rfft(head, n=n_fft, axis=-1)
    corr = jnp.fft.irfft(spec * jnp.conj(head_spec), n=n_fft,
                         axis=-1)[..., :win + 1]          # (B, F, win+1)

    sq = frames ** 2
    csum = jnp.cumsum(sq, axis=-1)
    e0 = csum[..., win - 1:win]                            # energy of x[0:win]
    # energy of x[tau : tau+win] for tau = 0..win
    e_tau = jnp.concatenate(
        [e0, csum[..., win:] - csum[..., :frame_length - win]], axis=-1)
    d = e0 + e_tau - 2.0 * corr                            # (B, F, win+1)
    d = jnp.maximum(d, 0.0)

    # cumulative mean normalized difference
    tau = jnp.arange(1, win + 1, dtype=jnp.float32)
    cmndf = d[..., 1:] * tau / jnp.maximum(
        jnp.cumsum(d[..., 1:], axis=-1), 1e-9)             # (B, F, win)

    lag_min = jnp.maximum(sampling_rate / f0_max, 2.0)
    lag_max = jnp.minimum(sampling_rate / f0_min, float(win - 2))
    lags = tau
    in_range = (lags >= lag_min) & (lags <= lag_max)
    cm_ranged = jnp.where(in_range, cmndf, jnp.inf)

    # troughs: local minima of cmndf within the lag range
    left = jnp.pad(cm_ranged, ((0, 0), (0, 0), (1, 0)),
                   constant_values=jnp.inf)[..., :-1]
    right = jnp.pad(cm_ranged, ((0, 0), (0, 0), (0, 1)),
                    constant_values=jnp.inf)[..., 1:]
    is_trough = (cm_ranged <= left) & (cm_ranged < right) & in_range

    # pYIN-style threshold sweep: p_voiced = weighted fraction of thresholds
    # with a trough below them (beta-ish prior mean around 0.1-0.3)
    thresholds = jnp.linspace(0.05, 1.0, 20)
    min_cm = jnp.min(jnp.where(is_trough, cm_ranged, jnp.inf), axis=-1)
    below = min_cm[..., None] < thresholds[None, None, :]
    weights = jnp.exp(-2.0 * thresholds)   # favor strict thresholds
    p_voiced = (below * weights).sum(-1) / weights.sum()
    # silent frames are unvoiced regardless
    rms = jnp.sqrt(jnp.mean(sq, axis=-1))
    p_voiced = jnp.where(rms > 1e-4, p_voiced, 0.0)
    voiced = p_voiced > 0.5

    # best trough: absolute-threshold YIN pick (first trough below 0.1, else
    # global min trough)
    yin_thresh = 0.1
    trough_cm = jnp.where(is_trough, cm_ranged, jnp.inf)
    below_t = trough_cm < yin_thresh
    first_below = jnp.argmax(below_t, axis=-1)
    any_below = below_t.any(axis=-1)
    best = jnp.where(any_below, first_below, jnp.argmin(trough_cm, axis=-1))

    # parabolic interpolation around the chosen lag on the raw cmndf
    idx = jnp.clip(best, 1, win - 2)
    take = lambda off: jnp.take_along_axis(cmndf, (idx + off)[..., None],
                                           axis=-1)[..., 0]
    y0, y1, y2 = take(-1), take(0), take(1)
    denom = y0 - 2 * y1 + y2
    delta = jnp.clip(0.5 * (y0 - y2) / jnp.where(
        jnp.abs(denom) < 1e-9, 1.0, denom), -0.5, 0.5)
    lag = (idx + 1).astype(jnp.float32) + delta
    f0 = sampling_rate / jnp.clip(lag, lag_min, lag_max)
    f0 = jnp.where(voiced, f0, 0.0)
    return f0, voiced.astype(jnp.float32), p_voiced
