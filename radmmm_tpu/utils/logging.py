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
    """Scalar/image/audio logging.

    Scalars are double-written: to TensorBoard (when tensorboardX is
    present) and always to a plain ``metrics.jsonl`` in the log dir —
    one ``{"step": N, "prefix/key": v, ...}`` object per ``scalars()``
    call — so curves are machine-readable without a TB event parser.
    """

    def __init__(self, log_dir: str, artifact_dir: Optional[str] = None,
                 enabled: bool = True):
        # multi-host: only process 0 writes (the reference's global_rank==0
        # guards, tts_lightning_modules.py:202); compute still runs on every
        # process, only the host-side sinks are gated
        self.enabled = enabled
        if not enabled:
            self.writer = None
            self.artifact_dir = None
            self._jsonl_path = None
            return
        os.makedirs(log_dir, exist_ok=True)
        self.writer = (SummaryWriter(log_dir)
                       if SummaryWriter is not None else None)
        self._jsonl_path = os.path.join(log_dir, "metrics.jsonl")
        # optional file sink: every image/audio also lands as a real file
        # under artifact_dir/step_N/ (TB's workflow, greppable on disk)
        self.artifact_dir = artifact_dir

    def _artifact_path(self, tag: str, step: int, ext: str) -> Optional[str]:
        if self.artifact_dir is None:
            return None
        d = os.path.join(self.artifact_dir, f"step_{step:07d}")
        os.makedirs(d, exist_ok=True)
        return os.path.join(d, tag.replace("/", "_") + ext)

    def scalars(self, prefix: str, metrics: Dict[str, float], step: int):
        if not self.enabled:
            return
        import json
        row = {"step": int(step)}
        for k, v in metrics.items():
            try:
                row[f"{prefix}/{k}"] = float(v)
            except (TypeError, ValueError):
                continue
            if self.writer is not None:
                self.writer.add_scalar(f"{prefix}/{k}", float(v), step)
        with open(self._jsonl_path, "a") as f:
            f.write(json.dumps(row) + "\n")

    def image(self, tag: str, img_hwc: np.ndarray, step: int):
        if not self.enabled:
            return
        path = self._artifact_path(tag, step, ".png")
        if path is not None:
            import matplotlib
            matplotlib.use("Agg")
            import matplotlib.pyplot as plt
            plt.imsave(path, np.asarray(img_hwc))
        if self.writer is None:
            return
        self.writer.add_image(tag, img_hwc, step, dataformats="HWC")

    def audio(self, tag: str, wav: np.ndarray, step: int,
              sampling_rate: int = 22050):
        if not self.enabled:
            return
        path = self._artifact_path(tag, step, ".wav")
        if path is not None:
            from scipy.io import wavfile as _wf
            w = np.asarray(wav, np.float32)
            peak = max(1.0, np.abs(w).max())
            _wf.write(path, sampling_rate,
                      (np.clip(w / peak, -1, 1) * 32767).astype(np.int16))
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
