"""End-to-end slice: CLI config -> fit a few steps -> checkpoint -> predict.

The 'minimum end-to-end slice' of SURVEY.md §7.2(6): data pipeline, text
frontend, encoder, attention+MAS, flow fwd/inv, losses, checkpointing,
prediction with griffin-lim vocoding — driven through the public CLI
builders on a tiny synthetic corpus.
"""
import json
import os

import numpy as np
import pytest
import yaml

from radmmm_tpu.training.cli import build_all
from radmmm_tpu.utils.config import (load_configs, apply_overrides,
                                     translate_reference_model_config)
from tests.test_data import corpus  # fixture reuse
from tests.test_pitch import tone


@pytest.fixture(scope="module")
def cfg_files(corpus, tmp_path_factory):
    root, datasets, phonemizer_cfg = corpus
    outdir = tmp_path_factory.mktemp("run")
    model_cfg = {
        "model": {
            "use_accent": True, "n_augmentations": 0, "n_speakers": 2,
            "n_accents": 2, "n_accent_dim": 2, "n_speaker_dim": 4,
            "n_text_dim": 16,
            "use_accent_emb_for_encoder": True,
            "use_speaker_emb_for_alignment": True,
            "n_mel_channels": 80,
            "decoder": {
                "class_path": "decoders.RADMMMFlow",
                "init_args": {
                    "use_accent": True, "n_accent_dim": 2,
                    "n_speaker_dim": 4, "n_text_dim": 18,
                    "use_context_lstm": True, "n_f0_dims": 1,
                    "n_energy_avg_dims": 1, "n_mel_channels": 80,
                    "n_flows": 2, "n_conv_layers_per_step": 1,
                    "n_early_size": 2, "n_early_every": 2,
                    "n_group_size": 2, "affine_model": "wavenet",
                    "scaling_fn": "tanh", "use_partial_padding": True,
                },
            },
            "decoder_loss": {
                "class_path": "loss.RADMMMLoss",
                "init_args": {"sigma": 1.0, "n_group_size": 2,
                              "kl_loss_start_iter": 4,
                              "binarization_loss_weight": 1.0,
                              "ctc_loss_weight": 0.1},
            },
            "f0_predictor": {
                "class_path": "attribute_predictors.ConvLSTMLinearDAP",
                "init_args": {"n_speaker_dim": 4, "n_accent_dim": 2,
                              "use_accent_embedding": True, "in_dim": 18,
                              "out_dim": 1, "reduction_factor": 2,
                              "n_backbone_layers": 1, "n_hidden": 8,
                              "kernel_size": 3, "target_offset": -5},
            },
            "duration_predictor": {
                "class_path": "attribute_predictors.ConvLSTMLinearDAP",
                "init_args": {"n_speaker_dim": 4, "n_accent_dim": 2,
                              "use_accent_embedding": True, "in_dim": 18,
                              "out_dim": 1, "reduction_factor": 2,
                              "n_backbone_layers": 1, "n_hidden": 8,
                              "kernel_size": 3, "log_target": True},
            },
            "energy_predictor": {
                "class_path": "attribute_predictors.ConvLSTMLinearDAP",
                "init_args": {"n_speaker_dim": 4, "n_accent_dim": 2,
                              "use_accent_embedding": True, "in_dim": 18,
                              "out_dim": 1, "reduction_factor": 2,
                              "n_backbone_layers": 1, "n_hidden": 8,
                              "kernel_size": 3, "target_offset": -0.75},
            },
            "voiced_predictor": {
                "class_path": "attribute_predictors.ConvLSTMLinearDAP",
                "init_args": {"n_speaker_dim": 4, "n_accent_dim": 2,
                              "use_accent_embedding": True, "in_dim": 18,
                              "out_dim": 1, "reduction_factor": 2,
                              "n_backbone_layers": 1, "n_hidden": 8,
                              "kernel_size": 3},
            },
            "optim_algo": "RAdam", "learning_rate": 1.0e-3,
            "binarization_start_iter": 3,
            "output_directory": str(outdir),
            "iters_per_checkpoint": 5,
        },
        # n_data=4: fit runs data-parallel over 4 of the 8 virtual CPU
        # devices (batch 4 -> 1 per device); predict then reuses the
        # sharded state
        "trainer": {"max_steps": 6, "val_check_interval": 1000,
                    "gradient_clip_val": 1.0, "n_data": 4, "n_model": 1},
    }
    data_cfg = {
        "data": {
            "init_args": {
                "batchsize": 4,
                "trainset_config": {"datasets": datasets},
                "sampling_rate": 22050, "filter_length": 1024,
                "hop_length": 256, "win_length": 1024,
                "n_mel_channels": 80, "mel_fmax": 8000.0,
                "f0_min": 80.0, "f0_max": 640.0,
                "use_log_f0": 1, "use_scaled_energy": 1,
                "symbol_set": "radmmm_phonemizer_marker_segregated",
                "cleaners": ["basic_cleaners"],
                "g2p_type": "phonemizer",
                "phonemizer_cfg": phonemizer_cfg,
                "dur_min": 0.1, "dur_max": 10.2,
                "speaker_stats_path": str(root / "stats.json"),
            },
        },
    }
    mpath = outdir / "model.yaml"
    dpath = outdir / "data.yaml"
    mpath.write_text(yaml.safe_dump(model_cfg))
    dpath.write_text(yaml.safe_dump(data_cfg))
    return str(mpath), str(dpath), outdir, root


def test_config_translation(cfg_files):
    mpath, dpath, outdir, root = cfg_files
    cfg = load_configs([mpath, dpath])
    cfg = apply_overrides(cfg, ["--model.learning_rate=5e-3"])
    tr = translate_reference_model_config(cfg)
    assert tr["optim"]["learning_rate"] == 5e-3
    assert tr["tts"]["decoder"]["n_flows"] == 2
    assert tr["loss"]["kl_loss_start_iter"] == 4
    assert tr["loss"]["binarization_start_iter"] == 3


def test_fit_on_mesh_matches_single_device(cfg_files, tmp_path):
    """CLI-level `fit` over a 4×2 data×model mesh produces the same params
    as a single-device fit, step for step (VERDICT round-1 item 2: the mesh
    must be a Trainer capability, not a demo)."""
    mpath, dpath, outdir, root = cfg_files

    def run(n_data, n_model, tag):
        cfg = load_configs([mpath, dpath])
        cfg["model"]["output_directory"] = str(tmp_path / tag)
        cfg["trainer"].update(max_steps=3, val_check_interval=1000,
                              n_data=n_data, n_model=n_model)
        dm, trainer = build_all(cfg)
        state = trainer.fit(dm, resume=False)
        return trainer, state

    tr1, s1 = run(1, 1, "single")
    assert tr1.mesh is None
    tr8, s8 = run(4, 2, "mesh")
    assert dict(tr8.mesh.shape) == {"data": 4, "model": 2}

    l1 = np.asarray(s1.params["text_embeddings"]["embedding"])
    l8 = np.asarray(s8.params["text_embeddings"]["embedding"])
    np.testing.assert_allclose(l8, l1, atol=2e-4)
    # a TP-sharded leaf must also agree after gathering
    w1 = np.asarray(s1.params["decoder"]["flow_0"]["coupling"]["wn"]
                    ["start"]["v"])
    w8 = np.asarray(s8.params["decoder"]["flow_0"]["coupling"]["wn"]
                    ["start"]["v"])
    np.testing.assert_allclose(w8, w1, atol=2e-4)
    # checkpoint written from the sharded run
    assert tr8.ckpt.latest_step() is not None


def test_fit_and_predict_end_to_end(cfg_files, tmp_path):
    mpath, dpath, outdir, root = cfg_files
    cfg = load_configs([mpath, dpath])
    dm, trainer = build_all(cfg)
    state = trainer.fit(dm)
    assert state is not None
    assert int(state.step) >= 6
    # checkpoint written
    assert trainer.ckpt.latest_step() is not None

    # predict from the trained state through the full sampling path
    transcript = [{"script": "hola mundo", "spk_id": "spk_a",
                   "emotion": "neutral", "language": "es_ES"}]
    tpath = tmp_path / "prompts.json"
    tpath.write_text(json.dumps(transcript))
    dm.inference_transcript = str(tpath)
    trainer.cfg.max_infer_frames = 128
    paths = trainer.predict(dm, state=state)
    assert len(paths) == 1 and os.path.exists(paths[0])
    from scipy.io import wavfile
    sr, wav = wavfile.read(paths[0])
    assert sr == 22050 and wav.size > 1000


def test_validate_logs_samples_and_artifacts(cfg_files, tmp_path):
    """validate() writes scalar rows to metrics.jsonl and, with
    save_val_artifacts, attention/mel images + reconstruction audio as
    files (the TB-less observability path the overfit demo relies on)."""
    import json
    mpath, dpath, outdir, root = cfg_files
    cfg = load_configs([mpath, dpath])
    cfg["model"]["output_directory"] = str(tmp_path / "valrun")
    # validate on the training files (the fixture corpus has no val split)
    cfg["data"]["init_args"]["valset_config"] = \
        cfg["data"]["init_args"]["trainset_config"]
    cfg["trainer"].update(max_steps=1, val_check_interval=1,
                          save_val_artifacts=True, griffin_lim_iters=3)
    dm, trainer = build_all(cfg)
    trainer.fit(dm, resume=False)

    rows = [json.loads(l) for l in
            open(tmp_path / "valrun" / "tb" / "metrics.jsonl")]
    val_rows = [r for r in rows if any(k.startswith("val/") for k in r)]
    assert val_rows and "val/loss" in val_rows[0]
    # objective quality scalars land in metrics.jsonl too (utils/quality.py)
    quality = {k for r in val_rows for k in r}
    assert {"val/mcd_db", "val/f0_rmse", "val/voicing_f1"} <= quality

    art = tmp_path / "valrun" / "val_artifacts" / "step_0000001"
    files = {p.name for p in art.iterdir()}
    assert {"val_attention_hard.png", "val_attention_soft.png",
            "val_mel_gt.png", "val_mel_reconstructed.png",
            "val_reconstruction.wav", "val_attributes.png"} <= files


def test_fit_megastep_loop(cfg_files, tmp_path):
    """fit with trainer.megastep_k=2: the megastep loop must cover phase
    boundaries (binarization_start_iter=3 forces per-batch fallback around
    step 3, whole groups elsewhere), count steps correctly, checkpoint,
    and produce finite losses. (Numerical equivalence of the megastep vs
    sequential steps is proven in test_training.py with matched keys.)"""
    mpath, dpath, outdir, root = cfg_files
    cfg = load_configs([mpath, dpath])
    cfg["model"]["output_directory"] = str(tmp_path / "megarun")
    cfg["trainer"].update(max_steps=6, val_check_interval=1000,
                          n_data=1, n_model=1, megastep_k=2)
    # batchsize 2 -> 2 batches/epoch: the 0.4-0.7 s utterances all land in
    # the same (64-frame, 16-token) scheduled bucket, so shape_runs yields
    # full K=2 groups and the whole-group megastep branch actually runs
    cfg["data"]["init_args"]["batchsize"] = 2
    dm, trainer = build_all(cfg)
    assert trainer.cfg.megastep_k == 2
    state = trainer.fit(dm, resume=False)
    assert int(state.step) >= 6
    assert trainer.ckpt.latest_step() is not None
    # the megastep executable was compiled and used (whole K-groups ran;
    # phase boundaries at steps 3/4 fall back to per-batch steps)
    assert any(k[0] == "mega" for k in trainer._step_cache), \
        "megastep branch never engaged"
    # metrics.jsonl rows written at interval crossings with finite losses
    import json as _json
    mfile = os.path.join(str(tmp_path / "megarun"), "tb", "metrics.jsonl")
    rows = [_json.loads(l) for l in open(mfile)] if os.path.exists(mfile) \
        else []
    for r in rows:
        if "train/loss" in r:
            assert np.isfinite(r["train/loss"])
