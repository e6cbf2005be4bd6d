"""The five BASELINE tracked config stacks build through the public CLI,
and the 16 kHz VANI/LIMMITS recipe runs fit end-to-end at smoke scale
(BASELINE.md "tracked configs"; reference configs/ + tts_main.py
multi-config composition)."""
import json
import os

import numpy as np
import pytest
import yaml
from scipy.io import wavfile

from radmmm_tpu.training.cli import build_all
from radmmm_tpu.utils.config import load_configs
from tests.test_pitch import tone

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def paths(*names):
    return [os.path.join(ROOT, "configs", n) for n in names]


TRACKED = {
    # (1) LJSpeech 22 kHz RADTTS decoder resynthesis
    "ljs22_radtts_decoder": paths(
        "radtts_model.yaml", "ljs_22khz_data.yaml", "radmmm_train.yaml"),
    # (2) LJSpeech attribute-predictor stack (7-config composition,
    # reference README.md:49-57)
    "ljs22_attribute_stack": paths(
        "radtts_model.yaml", "radtts_f0model.yaml",
        "radtts_durationmodel.yaml", "radtts_energymodel.yaml",
        "radtts_vpredmodel.yaml", "ljs_22khz_data.yaml",
        "radmmm_train.yaml"),
    # (3) RADMMM multilingual 7-language decoder
    "radmmm_multilingual_7lang": paths(
        "radmmm_model.yaml", "radmmm_attributes.yaml",
        "radmmm_opensource_data_phonemizerless.yaml", "radmmm_train.yaml"),
    # (4) end-to-end TTS predict stack (decoder + 4 predictors + vocoder
    # paths from the model config)
    "e2e_tts_hifigan": paths(
        "radmmm_model.yaml", "radmmm_f0model.yaml",
        "radmmm_durationmodel.yaml", "radmmm_energymodel.yaml",
        "radmmm_vpredmodel.yaml", "radmmm_opensource_16khz_data.yaml",
        "radmmm_train.yaml"),
    # (5) VANI/LIMMITS 16 kHz multi-speaker low-resource
    "vani_limmits_16khz": paths(
        "radmmm_16khz_model.yaml", "radmmm_opensource_16khz_data.yaml",
        "radmmm_train.yaml"),
}


@pytest.mark.parametrize("name", list(TRACKED))
def test_tracked_config_builds(name, tmp_path, monkeypatch):
    monkeypatch.chdir(ROOT)  # asset paths in configs are repo-relative
    cfg = load_configs(TRACKED[name])
    cfg.setdefault("model", {})["output_directory"] = str(tmp_path)
    dm, trainer = build_all(cfg)
    # production symbol inventory (439 = exact reference set, verified by
    # tests/test_reference_parity.py; the yamls' n_text_tokens: 426 is a
    # stale value the reference overrides via the data->model link)
    assert dm.n_text_tokens == 439
    mc = trainer.model.config
    assert mc.decoder["n_flows"] == 8
    assert mc.decoder["n_conv_layers_per_step"] == 4

    if name == "ljs22_attribute_stack":
        # RADTTS duration recipe uses the LSTMConv backbone
        assert mc.duration_predictor["_class"] == "LSTMConvDAP"
        assert mc.f0_predictor["kernel_size"] == 15
        assert mc.f0_predictor.get("n_accent_dim", 0) == 0
    if name == "radmmm_multilingual_7lang":
        assert len(dm.train_config) == 7 and len(dm.val_config) == 7
        # all pre-phonemized except the German train split (the reference
        # names a _filtered_phonemized filelist it never shipped; see the
        # config comment)
        assert all(d.get("phonemized")
                   for k, d in dm.train_config.items()
                   if k != "BerndUngerer")
        assert all(d.get("phonemized") for d in dm.val_config.values())
        assert dm.dataset_kwargs["use_wave_augmentations"]
        assert dm.dataset_kwargs["combine_speaker_and_emotion"]
    if name == "e2e_tts_hifigan":
        for p in ("f0_predictor", "energy_predictor", "voiced_predictor",
                  "duration_predictor"):
            assert getattr(mc, p) is not None and \
                getattr(mc, p)["in_dim"] == 520
    if name == "vani_limmits_16khz":
        assert dm.featurizer.sampling_rate == 16000
        assert trainer.loss_cfg.cross_covariance_weight == 1.0
        assert trainer.loss_cfg.speaker_reg == {"variance": 0.1,
                                                "covariance": 0.1}
        assert trainer.cfg.vocoder_checkpoint_path.endswith("g_00072000")


def test_cmudict_asset_loads():
    """assets/cmudict-0.7b (vendored CMU dictionary) loads through the G2P
    dictionary class (grapheme_dictionary.py/cmudict.py equivalents)."""
    from radmmm_tpu.text.dictionary import Grapheme2PhonemeDictionary
    d = Grapheme2PhonemeDictionary(
        os.path.join(ROOT, "assets", "cmudict-0.7b"))
    assert len(d) > 120_000
    assert d.lookup("hello") == ["HH AH0 L OW1", "HH EH0 L OW1"]
    assert d.lookup("read") == ["R EH1 D", "R IY1 D"]  # heteronym kept


def test_heteronyms_asset():
    het = set(open(os.path.join(ROOT, "assets", "heteronyms")).read().split())
    assert {"read", "abuse", "address"} <= het
    assert len(het) > 400


def test_prompt_files_parse():
    for name in ("resynthesis_prompts.json", "language_transfer_prompts.json"):
        with open(os.path.join(ROOT, "model_inputs", name)) as f:
            prompts = json.load(f)
        assert prompts
        for p in prompts:
            assert {"script", "spk_id", "language",
                    "decoder_spk_id"} <= set(p)


@pytest.fixture(scope="module")
def corpus16k(tmp_path_factory):
    """Tiny 16 kHz corpus in the opensource recipe's layout: combined
    speaker-emotion ids, emotion 'other', filelists + stats file."""
    root = tmp_path_factory.mktemp("corpus16k")
    sr = 16000
    wav_dir = root / "wavs" / "16khz"
    wav_dir.mkdir(parents=True)
    rows = []
    freqs = [150, 220, 180, 260]
    speakers = ["spk_a", "spk_a", "spk_b", "spk_b"]
    texts = ["hola mundo", "buenos dias", "hello world", "good morning"]
    for i, (f, spk, txt) in enumerate(zip(freqs, speakers, texts)):
        dur = 0.4 + 0.1 * i
        wav = (tone(f, dur=dur, sr=sr) * 32767 / 0.6).astype(np.int16)
        wavfile.write(wav_dir / f"utt{i}.wav", sr, wav)
        rows.append(f"utt{i}.wav|{txt}|{spk}|other|{dur:.2f}")
    (root / "train.txt").write_text("\n".join(rows))
    (root / "es.tsv").write_text(
        "hola\tˈola\nmundo\tˈmundo\nbuenos\tˈbwenos\ndias\tˈdias\n"
        "hello\thəˈloʊ\nworld\twɜrld\ngood\tɡʊd\nmorning\tˈmɔrnɪŋ\n",
        encoding="utf-8")
    stats = {f"{s}-other": {"log_f0_mean": 5.0, "log_f0_std": 0.3,
                            "f0_mean": 150.0, "f0_std": 40.0,
                            "energy_mean": 0.5, "energy_std": 0.1}
             for s in set(speakers)}
    (root / "stats.json").write_text(json.dumps(stats))
    return root


def test_16khz_recipe_smoke_fit(corpus16k, tmp_path, monkeypatch):
    """Drive the real 16 kHz VANI/LIMMITS recipe (model + data configs)
    through `fit` at smoke scale: only capacity hyperparameters and dataset
    paths are overridden (via a user-style overlay config); the 16 kHz
    feature pipeline, radtts_cleaners, combined speaker-emotion ids,
    emotion filter, and reference-schema wave augmentation all run live."""
    monkeypatch.chdir(ROOT)
    root = corpus16k
    overlay = {
        "model": {
            "output_directory": str(tmp_path / "run"),
            "n_speakers": 2, "n_accents": 2, "n_accent_dim": 2,
            "n_speaker_dim": 4, "n_text_dim": 16,
            "text_encoder": {"init_args": {"encoder_embedding_dim": 18}},
            "decoder": {"init_args": {
                "n_accent_dim": 2, "n_speaker_dim": 4, "n_text_dim": 18,
                "n_flows": 2, "n_conv_layers_per_step": 1}},
            "binarization_start_iter": 2,
            "iters_per_checkpoint": 3,
            "learning_rate": 1.0e-3,
        },
        "trainer": {"max_steps": 3, "val_check_interval": 1000,
                    "n_data": 2, "n_model": 1},
        "data": {
            "training_files": {
                # null entries remove the recipe's corpora in this overlay
                **{k: None for k in ("LJS", "BerndUngerer", "TUX", "Karen",
                                     "NadineEckert", "IIIT-HYD", "ED")},
                "TINY": {"basedir": str(root / "wavs"),
                         "sampling_rate": "16khz",
                         "filelist_basedir": str(root),
                         "filelist": "train.txt", "language": "es_ES"}},
            "validation_files": None,
            "batch_size": 4,
            "speaker_stats_path": str(root / "stats.json"),
            "phonemizer_cfg": {"es_ES": str(root / "es.tsv"),
                               "en_US": str(root / "es.tsv")},
            "dur_min": 0.05,
        },
    }
    opath = tmp_path / "overlay.yaml"
    opath.write_text(yaml.safe_dump(overlay))
    cfg = load_configs(paths("radmmm_16khz_model.yaml",
                             "radmmm_opensource_16khz_data.yaml",
                             "radmmm_train.yaml") + [str(opath)])
    dm, trainer = build_all(cfg)
    assert dm.featurizer.sampling_rate == 16000
    state = trainer.fit(dm, resume=False)
    assert int(state.step) >= 3
    # combined speaker-emotion ids with augmentation expansion survive
    assert set(dm.trainset.speaker_ids) == {"spk_a-other", "spk_b-other"}


def test_train_logger_jsonl_and_file_artifacts(tmp_path):
    """Scalars always land in metrics.jsonl; image/audio land as files when
    an artifact_dir is set (the TB-less observability path)."""
    import json
    import numpy as np
    from radmmm_tpu.utils.logging import TrainLogger

    lg = TrainLogger(str(tmp_path / "tb"), artifact_dir=str(tmp_path / "art"))
    lg.scalars("train", {"loss": 1.5, "bad": "nan-string"}, 3)
    lg.image("val/attn_hard", np.zeros((4, 4, 3), np.uint8), 7)
    lg.audio("val/rec", 0.1 * np.ones(256, np.float32), 7, 22050)

    rows = [json.loads(l) for l in
            open(tmp_path / "tb" / "metrics.jsonl")]
    assert rows == [{"step": 3, "train/loss": 1.5}]
    assert (tmp_path / "art" / "step_0000007" / "val_attn_hard.png").exists()
    wav_path = tmp_path / "art" / "step_0000007" / "val_rec.wav"
    from scipy.io import wavfile
    sr, wav = wavfile.read(wav_path)
    assert sr == 22050 and wav.size == 256


def test_trainer_config_passthrough(tmp_path, monkeypatch):
    """Non-explicit TrainerConfig fields in the trainer: section reach the
    Trainer (save_val_artifacts, detect_anomaly, log_interval, ...)."""
    monkeypatch.chdir(ROOT)
    cfg = load_configs(TRACKED["vani_limmits_16khz"])
    cfg.setdefault("model", {})["output_directory"] = str(tmp_path)
    cfg.setdefault("trainer", {}).update(
        save_val_artifacts=True, detect_anomaly=True, log_interval=5,
        max_infer_frames=256)
    dm, trainer = build_all(cfg)
    assert trainer.cfg.save_val_artifacts is True
    assert trainer.cfg.detect_anomaly is True
    assert trainer.cfg.log_interval == 5
    assert trainer.cfg.max_infer_frames == 256
    assert trainer.logger.artifact_dir is not None
