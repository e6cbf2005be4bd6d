"""Does the formant-scaling augmentation actually disentangle accent from
speaker? (VERDICT round-2 missing #2 / next #2.)

The reference's augmentation exists to decouple accent from speaker
identity (reference wave_transforms.py:34-79 "Change speaker",
tts_lightning_modules.py:127-136 augmented-speaker expansion). This
experiment measures that *capability* on the synthetic 4-speaker x
2-accent corpus (scripts/make_demo_corpus.py --accents), where speakers
are confounded with accents in training (each speaker recorded only in
its native accent) but the generator can realize the held-out CROSS
combinations with real ground truth:

1. train twice through the product CLI — identical configs except the
   augmentation overlay (aug.yaml: none/0.9/1.1 scale_formant, the
   opensource recipe's settings) and its speaker-table expansion;
2. evaluate both checkpoints on the held-out cross-accent utterances:
   decoder flow NLL and analysis-synthesis reconstruction mel-L1
   (TTSModel.reconstruct with GT attributes, speaker/accent ids of the
   *unseen* combination);
3. report the speaker<->accent embedding cross-covariance (the quantity
   the reference regularizes, loss.py:252-347 — the regularizer itself is
   OFF here so any difference is the augmentation's doing).

Writes examples/aug_experiment/{REPORT.md,metrics.json}.

Usage:
    python scripts/aug_disentangle_experiment.py [--steps 1200]
        [--workdir /tmp/aug_exp] [--outdir examples/aug_experiment]
"""
from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

import numpy as np


def cross_cov(spk_table: np.ndarray, acc_table: np.ndarray,
              spk_accent: list) -> float:
    """Frobenius norm of the cross-covariance between per-speaker
    embeddings and their (native) accent embeddings, normalized per
    element — the statistic AttributeMinCrossCovarianceRegLoss penalizes
    (losses/regularizers.py; reference loss.py:310-347)."""
    X = spk_table[: len(spk_accent)]
    Y = acc_table[np.asarray(spk_accent)]
    Xc = X - X.mean(0, keepdims=True)
    Yc = Y - Y.mean(0, keepdims=True)
    C = Xc.T @ Yc / max(1, X.shape[0] - 1)
    return float(np.sqrt((C ** 2).mean()))


def evaluate(configs, run_dir, cross_yaml):
    """Restore the run's checkpoint and measure NLL + reconstruction
    mel-L1 on the held-out cross-accent split."""
    import jax
    from radmmm_tpu.models.tts import TTSModel
    from radmmm_tpu.training.cli import build_all
    from radmmm_tpu.training.step import make_val_step, device_batch
    from radmmm_tpu.utils.config import load_configs

    cfg = load_configs(configs + [cross_yaml])
    cfg["model"]["output_directory"] = run_dir
    dm, trainer = build_all(cfg)
    dm.setup("fit")
    loader = dm.val_dataloader()
    first = next(iter(loader))
    state = trainer._init_state(first)
    state, step = trainer._restore_state(state, require=True)

    val_step = jax.jit(make_val_step(trainer.model, trainer.loss_cfg))
    nll, l1, n = [], [], 0
    for batch in loader:
        bd = device_batch(batch)
        m = val_step(state, bd)
        nll.append(float(m["loss_mel"]))
        rec = trainer.model.apply(state.model_variables(),
                                  jax.random.key(0), bd,
                                  method=TTSModel.reconstruct)
        mel_rec = np.asarray(rec["mel"])
        mel_gt = np.asarray(batch["mel"])
        lens = np.asarray(batch["output_lengths"])
        for i in range(mel_gt.shape[0]):
            L = int(lens[i])
            l1.append(float(np.abs(mel_rec[i, :L] - mel_gt[i, :L]).mean()))
        n += mel_gt.shape[0]

    spk = np.asarray(state.params["speaker_embeddings"]["embedding"])
    acc = np.asarray(state.params["accent_embeddings"]["embedding"])
    # native accents of spk_a..spk_d (make_demo_corpus.ACCENT_SPEAKERS);
    # ids are sorted-unique: spk_a=0..spk_d=3, acc ids en_UK=0, en_US=1
    spk_accent = [dm.trainset.accent_ids["en_US"],
                  dm.trainset.accent_ids["en_US"],
                  dm.trainset.accent_ids["en_UK"],
                  dm.trainset.accent_ids["en_UK"]]
    return {
        "ckpt_step": int(step),
        "cross_nll": float(np.mean(nll)),
        "cross_recon_mel_l1": float(np.mean(l1)),
        "n_cross_utts": n,
        "emb_cross_cov": cross_cov(spk, acc, spk_accent),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=1200)
    ap.add_argument("--workdir", default="/tmp/aug_exp")
    ap.add_argument("--outdir",
                    default=os.path.join(ROOT, "examples", "aug_experiment"))
    ap.add_argument("--n-train", type=int, default=64)
    ap.add_argument("--n-val", type=int, default=16)
    ap.add_argument("--reuse", action="store_true",
                    help="skip arms whose result_<tag>.json already exists "
                         "in the workdir (crash/interrupt recovery)")
    args = ap.parse_args()

    corpus = os.path.join(args.workdir, "corpus")
    if not os.path.exists(os.path.join(corpus, "aug.yaml")):
        subprocess.run(
            [sys.executable,
             os.path.join(ROOT, "scripts", "make_demo_corpus.py"), corpus,
             "--accents", "--n-train", str(args.n_train),
             "--n-val", str(args.n_val)],
            check=True, env={**os.environ, "JAX_PLATFORMS": ""})

    # held-out cross-combination overlay: validate on utterances of every
    # speaker in its NON-native accent
    import yaml
    cross_yaml = os.path.join(corpus, "cross.yaml")
    with open(os.path.join(corpus, "data.yaml")) as f:
        data_cfg = yaml.safe_load(f)
    val = data_cfg["data"]["init_args"]["valset_config"]
    cross_val = {k: dict(v, filelist=v["filelist"].replace("val_", "cross_"))
                 for k, v in val.items()}
    with open(cross_yaml, "w") as f:
        yaml.safe_dump({"data": {"init_args":
                                 {"valset_config": cross_val}}}, f)

    from radmmm_tpu.training.cli import main as cli_main

    results = {}
    for tag, extra in (("no_aug", []),
                       ("aug", ["-c", os.path.join(corpus, "aug.yaml")])):
        run_dir = os.path.join(args.workdir, f"run_{tag}")
        result_path = os.path.join(args.workdir, f"result_{tag}.json")
        if args.reuse and os.path.exists(result_path):
            with open(result_path) as f:
                results[tag] = json.load(f)
            print(tag, "(reused)", json.dumps(results[tag]))
            continue
        base = ["-c", os.path.join(corpus, "model.yaml"),
                "-c", os.path.join(corpus, "data.yaml"), *extra,
                f"--model.output_directory={run_dir}"]
        t0 = time.time()
        cli_main(["fit", *base,
                  f"--trainer.max_steps={args.steps}",
                  f"--model.iters_per_checkpoint={args.steps}",
                  "--trainer.val_check_interval=100000",
                  "--trainer.save_code_snapshot=False",
                  "--trainer.log_interval=100"])
        fit_s = time.time() - t0
        cfgs = [os.path.join(corpus, "model.yaml"),
                os.path.join(corpus, "data.yaml")] + \
            ([os.path.join(corpus, "aug.yaml")] if tag == "aug" else [])
        results[tag] = evaluate(cfgs, run_dir, cross_yaml)
        results[tag]["fit_seconds"] = round(fit_s, 1)
        with open(result_path, "w") as f:
            json.dump(results[tag], f)
        print(tag, json.dumps(results[tag]))

    os.makedirs(args.outdir, exist_ok=True)
    meta = {"steps": args.steps, "n_train": args.n_train,
            "corpus": "4 speakers x 2 accents, confounded",
            "results": results}
    with open(os.path.join(args.outdir, "metrics.json"), "w") as f:
        json.dump(meta, f, indent=1)

    na, au = results["no_aug"], results["aug"]
    better_nll = au["cross_nll"] < na["cross_nll"]
    better_l1 = au["cross_recon_mel_l1"] < na["cross_recon_mel_l1"]
    lower_cov = au["emb_cross_cov"] < na["emb_cross_cov"]
    report = f"""# Formant-augmentation disentanglement experiment

**Setup.** Synthetic 4-speaker x 2-accent corpus
(`scripts/make_demo_corpus.py --accents`): accent = systematic vowel-space
chain shift, speaker = F0 base + vocal-tract formant scale + breathiness.
Training data is CONFOUNDED (each speaker only in its native accent, 2 per
accent), exactly the situation the reference's formant-scaling
augmentation targets (reference wave_transforms.py:34-79,
tts_lightning_modules.py:127-136). Held-out evaluation uses the CROSS
combinations (every speaker rendered in the other accent) — synthesis
gives us ground truth no natural corpus has. Two identical
{args.steps}-step CLI trainings, differing only in `aug.yaml`
(none/0.9/1.1 `scale_formant`, the opensource recipe's settings) and the
augmented-speaker table expansion. The speaker<->accent cross-covariance
REGULARIZER IS OFF in both runs, so embedding differences are the
augmentation's effect alone.

**Results** (held-out cross-accent split, {na['n_cross_utts']} utts):

| metric | aug OFF | aug ON | aug better? |
|---|---|---|---|
| decoder flow NLL (cross) | {na['cross_nll']:.4f} | {au['cross_nll']:.4f} | {'YES' if better_nll else 'no'} |
| reconstruction mel-L1 (cross) | {na['cross_recon_mel_l1']:.4f} | {au['cross_recon_mel_l1']:.4f} | {'YES' if better_l1 else 'no'} |
| speaker<->accent embedding cross-cov | {na['emb_cross_cov']:.5f} | {au['emb_cross_cov']:.5f} | {'YES (lower)' if lower_cov else 'no'} |

**Reading.** Lower cross-NLL / mel-L1 on unseen (speaker, accent)
combinations means the decoder factorizes accent from voice instead of
memorizing their training-time pairing; lower embedding cross-covariance
means speaker embeddings carry less accent information. The augmentation
synthesizes formant-scaled copies under NEW speaker ids, forcing the
accent representation to explain vowel-target structure that varies
independently of vocal-tract scale.

**Acoustic correctness of the substitute** is asserted separately:
`tests/test_wave_transforms.py::test_formant_shift_ratio_matches_praat_semantics`
measures spectral-envelope formant peaks before/after `formant_shift` and
checks they scale by the requested ratio (Praat "Change speaker: Formant
shift ratio" multiplies formants by the ratio while preserving pitch).

Reproduce: `python scripts/aug_disentangle_experiment.py`
(metrics.json in this directory has the exact numbers + config).
"""
    with open(os.path.join(args.outdir, "REPORT.md"), "w") as f:
        f.write(report)
    print(report)


if __name__ == "__main__":
    main()
