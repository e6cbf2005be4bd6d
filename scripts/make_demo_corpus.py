"""Generate a synthetic pseudo-speech corpus for the overfit demo.

Produces a small multi-speaker corpus whose audio has real phonetic
structure — per-phone formant targets for vowels, band-limited noise for
fricatives, closure+burst for plosives, murmur for nasals — so the
aligner, F0/energy extractors, and the flow decoder all see speech-like
signals, while staying fully self-contained (no downloads; the box has no
egress). Texts are pseudo-words over an 11-phone inventory whose IPA
transcription is shipped as a phonemizer TSV, exercising the same G2P path
as the reference's phonemizer configs
(configs/RADMMM_opensource_data_config_phonemizerless.yaml:1-60).

Usage:
    python scripts/make_demo_corpus.py OUTDIR [--n-train 48] [--n-val 8]

Writes into OUTDIR:
    wavs/22050/*.wav  train.txt  val.txt  lexicon.tsv  stats.json
    model.yaml  data.yaml            (ready for `python -m radmmm_tpu fit`)
"""
from __future__ import annotations

import argparse
import json
import os

import numpy as np

SR = 22050

# vowel formants (F1, F2, F3) in Hz — canonical cardinal values
VOWELS = {
    "a": (800, 1200, 2500),
    "e": (500, 1900, 2600),
    "i": (300, 2300, 3000),
    "o": (500, 900, 2400),
    "u": (320, 750, 2300),
}
FRICATIVES = {"s": (4000, 9000)}          # noise band
NASALS = {"m": 250.0, "n": 350.0}          # murmur resonance
PLOSIVES = {"t": (3000, 6500), "k": (1200, 2800)}   # burst band
LIQUIDS = {"l": (400, 1000, 2600)}

WORDS = [
    "masi", "tuno", "kela", "simo", "lato", "nuke", "tila", "soma",
    "keni", "lusa", "mato", "nile", "suka", "tome", "lani", "kosu",
    "mesa", "tiko", "nulo", "sate", "lima", "konu", "mile", "tusa",
]

SPEAKERS = {
    "spk_a": {"f0": 210.0, "formant_scale": 1.10, "breath": 0.004},
    "spk_b": {"f0": 125.0, "formant_scale": 0.94, "breath": 0.002},
}

# --accents mode: accent = a systematic chain shift of the vowel space
# (per-vowel formant-target multipliers), independent of speaker identity
# (f0 base + vocal-tract formant_scale + breathiness). This mirrors the
# real phenomenon the reference's formant-scaling augmentation exists to
# disentangle (wave_transforms.py:34-79, tts_lightning_modules.py:127-136):
# accent lives in vowel TARGETS, speaker in the global tract scaling.
ACCENTS = {
    "acc_x": {},                                    # neutral realization
    "acc_y": {"a": (0.80, 1.28, 1.0), "e": (1.22, 0.88, 1.0),
              "i": (1.00, 0.78, 1.0), "o": (1.28, 1.22, 1.0),
              "u": (1.00, 1.35, 1.0), "l": (1.15, 0.85, 1.0)},
}

# 4 speakers, confounded with accent like real corpora: each speaker is
# recorded in ONE accent only (a,b -> acc_x; c,d -> acc_y)
ACCENT_SPEAKERS = {
    "spk_a": {"f0": 210.0, "formant_scale": 1.10, "breath": 0.004,
              "accent": "acc_x"},
    "spk_b": {"f0": 125.0, "formant_scale": 0.94, "breath": 0.002,
              "accent": "acc_x"},
    "spk_c": {"f0": 180.0, "formant_scale": 1.04, "breath": 0.003,
              "accent": "acc_y"},
    "spk_d": {"f0": 145.0, "formant_scale": 0.99, "breath": 0.002,
              "accent": "acc_y"},
}
# accent -> language tag: the data pipeline derives accent ids from the
# dataset `language` field, as the reference does
ACCENT_LANG = {"acc_x": "en_US", "acc_y": "en_UK"}


def _resonant_noise(n, bands, rng, tilt=0.0):
    """White noise band-passed (FFT brick-wall) to the given (lo, hi)."""
    x = rng.standard_normal(n)
    X = np.fft.rfft(x)
    f = np.fft.rfftfreq(n, 1.0 / SR)
    mask = np.zeros_like(f)
    lo, hi = bands
    mask[(f >= lo) & (f <= hi)] = 1.0
    if tilt:
        mask *= np.exp(-tilt * f / SR)
    y = np.fft.irfft(X * mask, n)
    return y / (np.abs(y).max() + 1e-8)


def _voiced(n, f0_curve, formants, scale, rng):
    """Harmonic source shaped by Gaussian formant resonances."""
    t = np.arange(n) / SR
    phase = 2 * np.pi * np.cumsum(f0_curve) / SR
    out = np.zeros(n)
    f0_mean = float(f0_curve.mean())
    n_harm = int(min(40, (SR / 2 - 200) / f0_mean))
    for h in range(1, n_harm + 1):
        fh = h * f0_mean
        amp = 0.0
        for k, F in enumerate(formants):
            Fs = F * scale
            bw = 90.0 + 40.0 * k
            amp += np.exp(-0.5 * ((fh - Fs) / bw) ** 2) / (1 + k)
        amp += 0.02 / h          # source spectral floor (glottal rolloff)
        out += amp * np.sin(h * phase)
    return out / (np.abs(out).max() + 1e-8)


def synth_phone(ph, dur_s, f0_curve, spk, rng, accent=None):
    n = int(dur_s * SR)
    scale = spk["formant_scale"]

    def targets(base):
        mult = (accent or {}).get(ph)
        if mult is None:
            return base
        return tuple(f * m for f, m in zip(base, mult))

    if ph in VOWELS:
        y = _voiced(n, f0_curve, targets(VOWELS[ph]), scale, rng)
        amp = 0.5
    elif ph in LIQUIDS:
        y = _voiced(n, f0_curve, targets(LIQUIDS[ph]), scale, rng)
        amp = 0.3
    elif ph in NASALS:
        y = _voiced(n, f0_curve, (NASALS[ph], 2500), scale, rng)
        amp = 0.25
    elif ph in FRICATIVES:
        lo, hi = FRICATIVES[ph]
        y = _resonant_noise(n, (lo * scale, hi * scale), rng)
        amp = 0.18
    elif ph in PLOSIVES:
        closure = int(0.6 * n)
        burst = n - closure
        lo, hi = PLOSIVES[ph]
        y = np.concatenate([
            np.zeros(closure),
            _resonant_noise(burst, (lo * scale, hi * scale), rng)
            * np.exp(-np.arange(burst) / (0.012 * SR))])
        amp = 0.35
    else:
        raise ValueError(ph)
    # onset/offset ramps avoid clicks
    ramp = min(int(0.008 * SR), n // 4)
    env = np.ones(n)
    env[:ramp] = np.linspace(0, 1, ramp)
    env[-ramp:] = np.linspace(1, 0, ramp)
    return amp * y * env


def synth_utterance(words, spk, rng, accent=None):
    """Concatenate phone renditions with declination F0 and word gaps."""
    phones = []
    for w in words:
        phones.extend(list(w))
        phones.append(" ")
    phones = phones[:-1]
    n_total = sum(1 for p in phones if p != " ")
    segs, f0_log = [], []
    idx = 0
    for ph in phones:
        if ph == " ":
            gap = int(rng.uniform(0.03, 0.06) * SR)
            segs.append(np.zeros(gap))
            f0_log.append(np.zeros(gap))
            continue
        if ph in VOWELS:
            dur = rng.uniform(0.09, 0.16)
        elif ph in PLOSIVES:
            dur = rng.uniform(0.06, 0.09)
        else:
            dur = rng.uniform(0.06, 0.10)
        n = int(dur * SR)
        # declination 1.12 -> 0.85 of base across the utterance + jitter
        pos = idx / max(1, n_total - 1)
        f0_base = spk["f0"] * (1.12 - 0.27 * pos)
        f0_curve = f0_base * (1 + 0.02 * np.sin(
            2 * np.pi * 5.5 * np.arange(n) / SR + rng.uniform(0, 6)))
        voiced = ph in VOWELS or ph in LIQUIDS or ph in NASALS
        segs.append(synth_phone(ph, dur, f0_curve, spk, rng, accent))
        f0_log.append(f0_curve if voiced else np.zeros(n))
        idx += 1
    wav = np.concatenate(segs)
    wav += spk["breath"] * rng.standard_normal(wav.size)
    f0s = np.concatenate(f0_log)
    return wav / (np.abs(wav).max() + 1e-8) * 0.7, f0s[f0s > 0]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("outdir")
    ap.add_argument("--n-train", type=int, default=48)
    ap.add_argument("--n-val", type=int, default=8)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--tiny", action="store_true",
                    help="minimal model config (fast compile, for tests)")
    ap.add_argument("--accents", action="store_true",
                    help="4-speaker x 2-accent corpus (speakers confounded "
                         "with accents) + held-out cross combinations, for "
                         "the augmentation disentanglement experiment")
    args = ap.parse_args()
    if args.accents:
        return main_accents(args)

    from scipy.io import wavfile

    rng = np.random.default_rng(args.seed)
    root = os.path.abspath(args.outdir)
    wav_dir = os.path.join(root, "wavs", str(SR))
    os.makedirs(wav_dir, exist_ok=True)

    speakers = list(SPEAKERS)
    rows = {"train": [], "val": []}
    spk_f0 = {s: [] for s in speakers}
    n_total = args.n_train + args.n_val
    for i in range(n_total):
        spk = speakers[i % len(speakers)]
        n_words = int(rng.integers(3, 8))
        words = [WORDS[int(rng.integers(0, len(WORDS)))]
                 for _ in range(n_words)]
        wav, f0s = synth_utterance(words, SPEAKERS[spk], rng)
        spk_f0[spk].append(f0s)
        name = f"utt{i:04d}.wav"
        wavfile.write(os.path.join(wav_dir, name), SR,
                      (wav * 32767).astype(np.int16))
        dur = wav.size / SR
        row = f"{name}|{' '.join(words)}|{spk}|neutral|{dur:.2f}"
        rows["val" if i >= args.n_train else "train"].append(row)

    for split, rws in rows.items():
        with open(os.path.join(root, f"{split}.txt"), "w") as f:
            f.write("\n".join(rws))

    # phonemizer lexicon: identity IPA with initial stress
    with open(os.path.join(root, "lexicon.tsv"), "w", encoding="utf-8") as f:
        for w in WORDS:
            f.write(f"{w}\tˈ{w}\n")

    stats = {}
    for s in speakers:
        f0s = np.concatenate(spk_f0[s])
        stats[s] = {
            "f0_mean": float(f0s.mean()), "f0_std": float(f0s.std()),
            "log_f0_mean": float(np.log(f0s).mean()),
            "log_f0_std": float(np.log(f0s).std()),
            "energy_mean": 0.5, "energy_std": 0.15,
        }
    with open(os.path.join(root, "stats.json"), "w") as f:
        json.dump(stats, f, indent=1)

    # fixed prompts synthesized at every validation (unseen word order)
    prompts = [
        {"script": "kela masi tuno", "spk_id": "spk_a",
         "emotion": "neutral", "language": "en_US"},
        {"script": "soma nile tusa lato", "spk_id": "spk_b",
         "emotion": "neutral", "language": "en_US"},
    ]
    with open(os.path.join(root, "prompts.json"), "w") as f:
        json.dump(prompts, f, indent=1)

    _write_configs(root, tiny=args.tiny)
    n_sec = sum(float(r.split("|")[-1]) for v in rows.values() for r in v)
    print(f"corpus: {n_total} utts ({n_sec:.1f}s) in {root}")
    print(f"fit: python -m radmmm_tpu fit -c {root}/model.yaml "
          f"-c {root}/data.yaml")


def main_accents(args):
    """4 speakers x 2 accents, speaker-accent CONFOUNDED train/val splits
    (each speaker recorded in its native accent only) plus held-out CROSS
    combinations (every speaker rendered in the other accent) that only a
    disentangled model can fit. The synthetic generator can realize any
    (speaker, accent) pair, so the cross split has real ground truth —
    the thing no natural corpus can provide."""
    from scipy.io import wavfile

    rng = np.random.default_rng(args.seed)
    root = os.path.abspath(args.outdir)
    wav_dir = os.path.join(root, "wavs", str(SR))
    os.makedirs(wav_dir, exist_ok=True)

    accents = list(ACCENTS)
    rows = {a: {"train": [], "val": [], "cross": []} for a in accents}
    spk_f0 = {s: [] for s in ACCENT_SPEAKERS}
    i = 0

    def render(spk, accent, split):
        nonlocal i
        n_words = int(rng.integers(3, 8))
        words = [WORDS[int(rng.integers(0, len(WORDS)))]
                 for _ in range(n_words)]
        wav, f0s = synth_utterance(words, ACCENT_SPEAKERS[spk], rng,
                                   ACCENTS[accent])
        spk_f0[spk].append(f0s)
        name = f"utt{i:04d}.wav"
        wavfile.write(os.path.join(wav_dir, name), SR,
                      (wav * 32767).astype(np.int16))
        dur = wav.size / SR
        rows[accent][split].append(
            f"{name}|{' '.join(words)}|{spk}|neutral|{dur:.2f}")
        i += 1

    native = {a: [s for s, d in ACCENT_SPEAKERS.items()
                  if d["accent"] == a] for a in accents}
    per_spk_train = args.n_train // len(ACCENT_SPEAKERS)
    per_spk_val = max(1, args.n_val // len(ACCENT_SPEAKERS))
    per_spk_cross = max(2, args.n_val // len(ACCENT_SPEAKERS))
    for accent in accents:
        for spk in native[accent]:
            for _ in range(per_spk_train):
                render(spk, accent, "train")
            for _ in range(per_spk_val):
                render(spk, accent, "val")
    # cross combinations: every speaker in its NON-native accent
    for accent in accents:
        other = accents[1 - accents.index(accent)]
        for spk in native[other]:
            for _ in range(per_spk_cross):
                render(spk, accent, "cross")

    for accent in accents:
        for split, rws in rows[accent].items():
            with open(os.path.join(root, f"{split}_{accent}.txt"), "w") as f:
                f.write("\n".join(rws))

    with open(os.path.join(root, "lexicon.tsv"), "w", encoding="utf-8") as f:
        for w in WORDS:
            f.write(f"{w}\tˈ{w}\n")

    stats = {}
    for s in ACCENT_SPEAKERS:
        f0s = np.concatenate(spk_f0[s])
        stats[s] = {
            "f0_mean": float(f0s.mean()), "f0_std": float(f0s.std()),
            "log_f0_mean": float(np.log(f0s).mean()),
            "log_f0_std": float(np.log(f0s).std()),
            "energy_mean": 0.5, "energy_std": 0.15,
        }
    with open(os.path.join(root, "stats.json"), "w") as f:
        json.dump(stats, f, indent=1)

    _write_accent_configs(root, tiny=args.tiny)
    n_utts = i
    print(f"accent corpus: {n_utts} utts, {len(ACCENT_SPEAKERS)} speakers x "
          f"{len(accents)} accents (confounded; cross splits held out) "
          f"in {root}")


def _accent_dataset(root, accent, split):
    return {
        "basedir": os.path.join(root, "wavs"),
        "sampling_rate": SR,
        "filelist_basedir": root,
        "filelist": f"{split}_{accent}.txt",
        "language": ACCENT_LANG[accent],
        "phonemized": False,
    }


def _write_accent_configs(root: str, tiny: bool = False):
    """model/data yamls for the 4x2 accent corpus + an `aug.yaml` overlay
    that turns on the formant-scaling augmentation (the reference's
    opensource recipe settings: none/0.9/1.1,
    RADMMM_opensource_data_config_phonemizerless.yaml wave_aug_config)."""
    import yaml
    _write_configs(root, tiny=tiny)  # base model.yaml/data.yaml, then edit
    with open(os.path.join(root, "model.yaml")) as f:
        model_cfg = yaml.safe_load(f)
    m = model_cfg["model"]
    m.update(n_speakers=4, n_accents=2, n_augmentations=0)
    # the cross-covariance regularizer stays OFF so the measured
    # disentanglement comes from the augmentation, not the loss term
    model_cfg["trainer"]["val_prompts_path"] = None
    with open(os.path.join(root, "model.yaml"), "w") as f:
        yaml.safe_dump(model_cfg, f)

    with open(os.path.join(root, "data.yaml")) as f:
        data_cfg = yaml.safe_load(f)
    init = data_cfg["data"]["init_args"]
    # both accents share the identity lexicon; accent id comes from the
    # dataset `language` tag, so en_UK needs its own phonemizer entry
    init["phonemizer_cfg"] = {
        lang: os.path.join(root, "lexicon.tsv")
        for lang in ACCENT_LANG.values()}
    init["trainset_config"] = {
        f"demo_{a}": _accent_dataset(root, a, "train") for a in ACCENTS}
    init["valset_config"] = {
        f"demo_{a}": _accent_dataset(root, a, "val") for a in ACCENTS}
    with open(os.path.join(root, "data.yaml"), "w") as f:
        yaml.safe_dump(data_cfg, f)

    aug_cfg = {
        "model": {"n_augmentations": 2},
        "data": {"init_args": {
            "use_wave_augmentations": True,
            "wave_aug_config": {
                "aug_types": ["none", "scale_formant", "scale_formant"],
                "aug_scales": [1.0, 0.9, 1.1],
                "aug_probabilities": [0.6, 0.2, 0.2],
                "randomize_transform": True,
            },
        }},
    }
    with open(os.path.join(root, "aug.yaml"), "w") as f:
        yaml.safe_dump(aug_cfg, f)


def _write_configs(root: str, tiny: bool = False):
    """Reference-format model/data yamls sized to overfit this corpus.

    ``tiny`` writes a minimal model (2 flows, 8-wide DAPs) for fast-compile
    CI-style runs (e.g. the multi-host test).
    """
    import yaml
    n_text = 16 if tiny else 64
    dap = dict(n_speaker_dim=8, n_accent_dim=4, use_accent_embedding=True,
               in_dim=n_text + 4, out_dim=1, reduction_factor=2 if tiny else 4,
               n_backbone_layers=1 if tiny else 2, n_hidden=8 if tiny else 64,
               kernel_size=3, p_dropout=0.25, lstm_type="bilstm")
    model_cfg = {
        "model": {
            "use_accent": True, "n_augmentations": 0,
            "n_speakers": 2, "n_accents": 1,
            "n_speaker_dim": 8, "n_accent_dim": 4, "n_text_dim": n_text,
            "use_accent_emb_for_encoder": True,
            "use_speaker_emb_for_alignment": True,
            "n_mel_channels": 80,
            "decoder": {
                "class_path": "decoders.RADMMMFlow",
                "init_args": {
                    "use_accent": True, "n_accent_dim": 4,
                    "n_speaker_dim": 8, "n_text_dim": n_text + 4,
                    "use_context_lstm": True, "n_f0_dims": 1,
                    "n_energy_avg_dims": 1, "n_mel_channels": 80,
                    "n_flows": 2 if tiny else 6,
                    "n_conv_layers_per_step": 1 if tiny else 3,
                    "n_early_size": 2, "n_early_every": 2,
                    "n_group_size": 2, "affine_model": "wavenet",
                    "scaling_fn": "tanh", "use_partial_padding": True,
                },
            },
            "decoder_loss": {
                "class_path": "loss.RADMMMLoss",
                "init_args": {"sigma": 1.0, "n_group_size": 2,
                              "kl_loss_start_iter": 700,
                              "binarization_loss_weight": 1.0,
                              "ctc_loss_weight": 0.1},
            },
            "f0_predictor": {
                "class_path": "attribute_predictors.ConvLSTMLinearDAP",
                "init_args": dict(dap, target_offset=-5.0),
            },
            "duration_predictor": {
                "class_path": "attribute_predictors.ConvLSTMLinearDAP",
                "init_args": dict(dap, log_target=True),
            },
            "energy_predictor": {
                "class_path": "attribute_predictors.ConvLSTMLinearDAP",
                "init_args": dict(dap, target_offset=-0.75),
            },
            "voiced_predictor": {
                "class_path": "attribute_predictors.ConvLSTMLinearDAP",
                "init_args": dict(dap),
            },
            "optim_algo": "RAdam", "learning_rate": 1.0e-3,
            "weight_decay": 1.0e-6,
            "binarization_start_iter": 500,
            "output_directory": os.path.join(root, "run"),
            "iters_per_checkpoint": 1000,
        },
        "trainer": {"max_steps": 3000, "val_check_interval": 250,
                    "gradient_clip_val": 1.0, "max_epochs": 100000,
                    "save_val_artifacts": True, "log_interval": 25,
                    "griffin_lim_iters": 40, "max_infer_frames": 512,
                    "val_prompts_path": os.path.join(root, "prompts.json")},
    }
    data_cfg = {
        "data": {
            "init_args": {
                "batchsize": 8,
                "trainset_config": {"demo": {
                    "basedir": os.path.join(root, "wavs"),
                    "sampling_rate": SR,
                    "filelist_basedir": root,
                    "filelist": "train.txt",
                    "language": "en_US", "phonemized": False}},
                "valset_config": {"demo": {
                    "basedir": os.path.join(root, "wavs"),
                    "sampling_rate": SR,
                    "filelist_basedir": root,
                    "filelist": "val.txt",
                    "language": "en_US", "phonemized": False}},
                "sampling_rate": SR, "filter_length": 1024,
                "hop_length": 256, "win_length": 1024,
                "n_mel_channels": 80, "mel_fmax": 8000.0,
                "f0_min": 80.0, "f0_max": 640.0,
                "use_log_f0": 1, "use_scaled_energy": 1,
                "symbol_set": "radmmm_phonemizer_marker_segregated",
                "cleaners": ["basic_cleaners"],
                "g2p_type": "phonemizer",
                "phonemizer_cfg": {
                    "en_US": os.path.join(root, "lexicon.tsv")},
                "dur_min": 0.1, "dur_max": 10.2,
                "speaker_stats_path": os.path.join(root, "stats.json"),
            },
        },
    }
    import io
    with open(os.path.join(root, "model.yaml"), "w") as f:
        yaml.safe_dump(model_cfg, f)
    with open(os.path.join(root, "data.yaml"), "w") as f:
        yaml.safe_dump(data_cfg, f)


if __name__ == "__main__":
    main()
