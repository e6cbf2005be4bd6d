"""TensorBoard logging + plotting utilities.

Equivalent of the reference's PTL self.log + training_callbacks.py image/
audio logging and plotting_utils.py (attention maps, mel images, attribute
curves), built on tensorboardX.
"""
from __future__ import annotations

import os
from typing import Dict, Optional

import numpy as np

try:
    from tensorboardX import SummaryWriter
except Exception:  # pragma: no cover
    SummaryWriter = None


def plot_alignment_to_numpy(alignment: np.ndarray) -> np.ndarray:
    """(T_mel, T_text) attention -> HWC uint8 image
    (plotting_utils.py:52)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    fig, ax = plt.subplots(figsize=(6, 4))
    im = ax.imshow(alignment.T, aspect="auto", origin="lower",
                   interpolation="none")
    fig.colorbar(im, ax=ax)
    ax.set_xlabel("mel frames")
    ax.set_ylabel("text tokens")
    fig.canvas.draw()
    data = np.asarray(fig.canvas.buffer_rgba())[..., :3]
    plt.close(fig)
    return data


def plot_mel_to_numpy(mel: np.ndarray) -> np.ndarray:
    """(T, n_mels) -> HWC uint8 image (plotting_utils.py:35)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    fig, ax = plt.subplots(figsize=(8, 3))
    im = ax.imshow(mel.T, aspect="auto", origin="lower",
                   interpolation="none")
    fig.colorbar(im, ax=ax)
    fig.canvas.draw()
    data = np.asarray(fig.canvas.buffer_rgba())[..., :3]
    plt.close(fig)
    return data


def plot_curves_to_numpy(curves: Dict[str, np.ndarray]) -> np.ndarray:
    """Named 1-D curves (f0/energy/voiced) on one axis
    (plotting_utils.py:81)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    fig, ax = plt.subplots(figsize=(8, 3))
    for name, c in curves.items():
        ax.plot(np.asarray(c), label=name)
    ax.legend(loc="upper right")
    fig.canvas.draw()
    data = np.asarray(fig.canvas.buffer_rgba())[..., :3]
    plt.close(fig)
    return data


class TrainLogger:
    """Scalar/image/audio logging; no-op when tensorboardX is absent."""

    def __init__(self, log_dir: str):
        os.makedirs(log_dir, exist_ok=True)
        self.writer = (SummaryWriter(log_dir)
                       if SummaryWriter is not None else None)

    def scalars(self, prefix: str, metrics: Dict[str, float], step: int):
        if self.writer is None:
            return
        for k, v in metrics.items():
            try:
                self.writer.add_scalar(f"{prefix}/{k}", float(v), step)
            except (TypeError, ValueError):
                pass

    def image(self, tag: str, img_hwc: np.ndarray, step: int):
        if self.writer is None:
            return
        self.writer.add_image(tag, img_hwc, step, dataformats="HWC")

    def audio(self, tag: str, wav: np.ndarray, step: int,
              sampling_rate: int = 22050):
        if self.writer is None:
            return
        wav = np.asarray(wav, np.float32)
        peak = np.abs(wav).max()
        if peak > 1.0:
            wav = wav / peak
        # encode the wav with scipy instead of tensorboardX's add_audio,
        # whose soundfile dependency is not available in this environment
        import io
        from scipy.io import wavfile as _wavfile
        from tensorboardX.proto.summary_pb2 import Summary
        buf = io.BytesIO()
        _wavfile.write(buf, sampling_rate,
                       (np.clip(wav, -1, 1) * 32767).astype(np.int16))
        audio = Summary.Audio(sample_rate=sampling_rate, num_channels=1,
                              length_frames=wav.size,
                              encoded_audio_string=buf.getvalue(),
                              content_type="audio/wav")
        self.writer._get_file_writer().add_summary(
            Summary(value=[Summary.Value(tag=tag, audio=audio)]), step)

    def flush(self):
        if self.writer is not None:
            self.writer.flush()
