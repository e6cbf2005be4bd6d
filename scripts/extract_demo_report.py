"""Extract a committed evidence report from an overfit-demo run directory.

Reads <run>/tb/metrics.jsonl (written by TrainLogger) plus
<run>/val_artifacts/, renders loss-curve PNGs, and copies the first/last
attention maps and the final audio samples into an output report directory
together with a summary.json (final losses, median step rate).

Usage:
    python scripts/extract_demo_report.py RUN_DIR OUT_DIR \
        [--binarization-step 500] [--kl-step 700]
"""
from __future__ import annotations

import argparse
import glob
import json
import os
import shutil

import numpy as np

# categorical palette (validated reference instance, fixed slot order)
C1, C2, C3, C4 = "#2a78d6", "#eb6834", "#1baf7a", "#eda100"
INK, MUTED = "#0b0b0b", "#52514e"


def load_metrics(path):
    rows = [json.loads(l) for l in open(path)]
    series = {}
    for r in rows:
        for k, v in r.items():
            if k != "step":
                series.setdefault(k, []).append((r["step"], v))
    return {k: np.asarray(v) for k, v in series.items()}


def _style(ax, title, xlabel="step"):
    ax.set_title(title, color=INK, fontsize=11, loc="left")
    ax.set_xlabel(xlabel, color=MUTED, fontsize=9)
    ax.tick_params(colors=MUTED, labelsize=8)
    ax.grid(True, color="#e6e5e1", linewidth=0.6)
    for s in ax.spines.values():
        s.set_visible(False)


def _phase_marks(ax, marks):
    lo, hi = ax.get_ylim()
    for n, (step, label) in enumerate(marks):
        ax.axvline(step, color=MUTED, linestyle="--", linewidth=0.8,
                   alpha=0.6)
        ax.text(step, hi - n * 0.09 * (hi - lo), f" {label}", color=MUTED,
                fontsize=7, va="top")


def plot_losses(series, out_png, marks):
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, (ax1, ax2) = plt.subplots(1, 2, figsize=(10, 3.4), dpi=150)
    fig.patch.set_facecolor("#fcfcfb")
    for ax in (ax1, ax2):
        ax.set_facecolor("#fcfcfb")

    tr = series["train/loss"]
    ax1.plot(tr[:, 0], tr[:, 1], color=C1, linewidth=2, label="train")
    if "val/loss" in series:
        va = series["val/loss"]
        ax1.plot(va[:, 0], va[:, 1], color=C2, linewidth=2, label="val")
    _style(ax1, "Total loss")
    ax1.legend(frameon=False, fontsize=8, labelcolor=MUTED)
    _phase_marks(ax1, marks)

    mel = series["train/loss_mel"]
    ax2.plot(mel[:, 0], mel[:, 1], color=C1, linewidth=2)
    _style(ax2, "Flow NLL (train loss_mel)")
    _phase_marks(ax2, marks)

    fig.tight_layout()
    fig.savefig(out_png, facecolor=fig.get_facecolor())
    plt.close(fig)


def plot_attributes(series, out_png):
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    keys = [("val/f0_loss", "F0", C1), ("val/energy_loss", "energy", C2),
            ("val/duration_loss", "duration", C3),
            ("val/vpred_loss", "voiced", C4)]
    keys = [(k, n, c) for k, n, c in keys if k in series]
    if not keys:
        return
    fig, ax = plt.subplots(figsize=(6, 3.2), dpi=150)
    fig.patch.set_facecolor("#fcfcfb")
    ax.set_facecolor("#fcfcfb")
    for k, name, color in keys:
        v = series[k]
        ax.plot(v[:, 0], v[:, 1], color=color, linewidth=2, label=name)
    ax.set_yscale("log")
    _style(ax, "Attribute-predictor validation losses (log scale)")
    ax.legend(frameon=False, fontsize=8, labelcolor=MUTED, ncols=2)
    fig.tight_layout()
    fig.savefig(out_png, facecolor=fig.get_facecolor())
    plt.close(fig)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("run_dir")
    ap.add_argument("out_dir")
    ap.add_argument("--binarization-step", type=int, default=500)
    ap.add_argument("--kl-step", type=int, default=700)
    args = ap.parse_args()

    os.makedirs(args.out_dir, exist_ok=True)
    series = load_metrics(os.path.join(args.run_dir, "tb", "metrics.jsonl"))
    marks = [(args.binarization_step, "binarize"), (args.kl_step, "KL")]
    plot_losses(series, os.path.join(args.out_dir, "loss_curves.png"), marks)
    plot_attributes(series, os.path.join(args.out_dir,
                                         "attribute_losses.png"))

    # attention hardening: first vs last validation's soft/hard maps
    art = sorted(glob.glob(os.path.join(args.run_dir, "val_artifacts",
                                        "step_*")))
    copied = []
    if art:
        for tag, d in (("first", art[0]), ("last", art[-1])):
            step = os.path.basename(d).split("_")[1].lstrip("0") or "0"
            for f in ("val_attention_soft.png", "val_attention_hard.png"):
                src = os.path.join(d, f)
                if os.path.exists(src):
                    dst = f"{tag}_step{step}_{f[4:]}"
                    shutil.copy(src, os.path.join(args.out_dir, dst))
                    copied.append(dst)
        for f in sorted(os.listdir(art[-1])):
            if f.endswith(".wav") or f in ("val_mel_reconstructed.png",
                                           "val_attributes.png",
                                           "val_tts_mel_0.png"):
                shutil.copy(os.path.join(art[-1], f),
                            os.path.join(args.out_dir, "final_" + f))
                copied.append("final_" + f)

    tr = series["train/loss"]
    sps = series.get("train/steps_per_sec")
    summary = {
        "steps": int(tr[-1, 0]),
        "train_loss_first": float(tr[0, 1]),
        "train_loss_final": float(tr[-1, 1]),
        "train_loss_mel_final": float(series["train/loss_mel"][-1, 1]),
        "median_steps_per_sec": (float(np.median(sps[1:, 1]))
                                 if sps is not None else None),
        "val_loss_final": (float(series["val/loss"][-1, 1])
                           if "val/loss" in series else None),
        # objective quality scalars from the final validation — the
        # committed calibration baseline for slow-regression comparison
        # (utils/quality.py; VERDICT r4 weak #7)
        "val_quality_final": {
            k.split("/")[1]: float(series[k][-1, 1])
            for k in ("val/mcd_db", "val/f0_rmse", "val/voicing_f1")
            if k in series},
        "artifacts": copied,
    }
    with open(os.path.join(args.out_dir, "summary.json"), "w") as f:
        json.dump(summary, f, indent=1)
    print(json.dumps(summary, indent=1))


if __name__ == "__main__":
    main()
