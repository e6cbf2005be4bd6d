"""Data pipeline: filelists -> dataset -> collate -> device featurization."""
import json
import os

import numpy as np
import pytest
from scipy.io import wavfile

from radmmm_tpu.data.collate import collate_host, Featurizer, BucketBatcher
from radmmm_tpu.data.dataset import (AudioDataset, TextOnlyData,
                                     attribute_id_table)
from radmmm_tpu.data.loader import DataLoader
from radmmm_tpu.data.module import AudioDataModule
from tests.test_pitch import tone


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    """Tiny 2-language synthetic corpus in the reference's filelist format."""
    root = tmp_path_factory.mktemp("corpus")
    sr = 22050
    wav_dir = root / "wavs" / str(sr)
    wav_dir.mkdir(parents=True)
    rows = []
    freqs = [150, 220, 180, 260]
    speakers = ["spk_a", "spk_a", "spk_b", "spk_b"]
    texts = ["hola mundo", "buenos dias", "hello world", "good morning"]
    langs = ["es_ES", "es_ES", "en_US", "en_US"]
    for i, (f, spk, txt) in enumerate(zip(freqs, speakers, texts)):
        dur = 0.4 + 0.1 * i
        wav = (tone(f, dur=dur) * 32767 / 0.6).astype(np.int16)
        name = f"utt{i}.wav"
        wavfile.write(wav_dir / name, sr, wav)
        rows.append(f"{name}|{txt}|{spk}|neutral|{dur:.2f}")
    (root / "train_es.txt").write_text(
        "\n".join(r for r, l in zip(rows, langs) if l == "es_ES"))
    (root / "train_en.txt").write_text(
        "\n".join(r for r, l in zip(rows, langs) if l == "en_US"))

    # per-language G2P dicts
    (root / "es.tsv").write_text(
        "hola\tˈola\nmundo\tˈmundo\nbuenos\tˈbwenos\ndias\tˈdias\n",
        encoding="utf-8")
    (root / "en.tsv").write_text(
        "hello\thəˈloʊ\nworld\twɜrld\ngood\tɡʊd\nmorning\tˈmɔrnɪŋ\n",
        encoding="utf-8")

    stats = {s: {"log_f0_mean": 5.0, "log_f0_std": 0.3, "f0_mean": 150.0,
                 "f0_std": 40.0, "energy_mean": 0.5, "energy_std": 0.1}
             for s in set(speakers)}
    (root / "stats.json").write_text(json.dumps(stats))

    datasets = {
        "es": {"basedir": str(root / "wavs"), "sampling_rate": sr,
               "filelist_basedir": str(root), "filelist": "train_es.txt",
               "language": "es_ES", "phonemized": False},
        "en": {"basedir": str(root / "wavs"), "sampling_rate": sr,
               "filelist_basedir": str(root), "filelist": "train_en.txt",
               "language": "en_US", "phonemized": False},
    }
    phonemizer_cfg = {"es_ES": str(root / "es.tsv"),
                      "en_US": str(root / "en.tsv")}
    return root, datasets, phonemizer_cfg


def make_module(corpus, **kw):
    root, datasets, phonemizer_cfg = corpus
    return AudioDataModule(
        train_config=datasets, batch_size=4,
        cleaner_names=["basic_cleaners"], g2p_type="phonemizer",
        phonemizer_cfg=phonemizer_cfg,
        dataset_kwargs=dict(speaker_stats_path=str(root / "stats.json"),
                            dur_min=0.1, dur_max=10.2, **kw),
        featurizer_kwargs=dict(mel_fmax=8000.0), num_threads=2)


def test_dataset_ids_and_items(corpus):
    dm = make_module(corpus)
    dm.setup("fit")
    ds = dm.trainset
    assert len(ds) == 4
    assert ds.speaker_ids == {"spk_a": 0, "spk_b": 1}
    assert ds.accent_ids == {"en_US": 0, "es_ES": 1}
    item = ds[0]
    assert item["audio"].ndim == 1 and np.abs(item["audio"]).max() <= 1.0
    assert item["text_encoded"].dtype == np.int32
    assert len(item["text_encoded"]) > 2
    assert item["speaker_f0_mean"] == 5.0


def test_collate_and_featurize(corpus):
    dm = make_module(corpus)
    dm.setup("fit")
    items = [dm.trainset[i] for i in range(4)]
    host = collate_host(items)
    B, T = host["audio"].shape
    assert B == 4 and T % 256 == 0 and (T // 256) % 64 == 0
    batch = dm.featurizer(host)
    F = batch["mel"].shape[1]
    assert batch["mel"].shape == (4, F, 80)
    assert batch["attn_prior"].shape == (4, F, host["text"].shape[1])
    mel_lens = np.asarray(batch["output_lengths"])
    # tones are voiced: f0 present within valid frames
    f0 = np.asarray(batch["f0"])
    for i in range(4):
        valid = f0[i, : mel_lens[i]]
        assert (valid > 0).mean() > 0.6
        assert np.abs(f0[i, mel_lens[i]:]).max() == 0
    # energy finite and scaled
    assert np.isfinite(np.asarray(batch["energy_avg"])).all()


def test_dataloader_iterates(corpus):
    dm = make_module(corpus)
    dm.setup("fit")
    loader = DataLoader(dm.trainset, batch_size=2, shuffle=True,
                        featurizer=dm.featurizer, num_threads=2)
    batches = list(iter(loader))
    assert len(batches) == 2
    seen = sorted(int(i) for b in batches for i in np.asarray(b["idx"]))
    assert seen == [0, 1, 2, 3]


def test_augmented_speaker_expansion(corpus):
    dm = make_module(corpus, use_wave_augmentations=True,
                     wave_aug_config=dict(aug_probability=1.0,
                                          n_augmentations=2))
    dm.setup("fit")
    item = dm.trainset[0]
    # base speaker count 2: augmented ids in {base + 2, base + 4}
    assert item["speaker_id"] >= 2


def test_text_only_data(corpus, tmp_path):
    root, datasets, phonemizer_cfg = corpus
    transcript = [
        {"script": "hola mundo", "spk_id": "spk_a", "emotion": "neutral",
         "language": "es_ES"},
        {"script": "hello world", "spk_id": "spk_b", "emotion": "neutral",
         "language": "en_US", "decoder_spk_id": "spk_a"},
    ]
    tpath = tmp_path / "prompts.json"
    tpath.write_text(json.dumps(transcript))
    dm = make_module(corpus)
    dm.inference_transcript = str(tpath)
    dm.setup("predict")
    items = list(dm.predict_items())
    assert len(items) == 2
    assert items[0]["spk_id"] == 0 and items[0]["decoder_spk_id"] == 0
    assert items[1]["spk_id"] == 1 and items[1]["decoder_spk_id"] == 0
    assert items[1]["speaker_f0_mean"] == 5.0


def test_bucket_batcher_groups_by_length():
    lengths = [1.0, 5.0, 1.1, 5.1, 1.2, 5.2]
    bb = BucketBatcher(lengths, batch_size=3, shuffle=False)
    batches = list(iter(bb))
    assert sorted(batches[0]) == [0, 2, 4]
    assert sorted(batches[1]) == [1, 3, 5]


def test_bucket_batcher_reshuffles_membership_each_epoch():
    """Batch composition must vary across epochs (within length windows)
    while still covering every index exactly once per epoch."""
    rng = np.random.default_rng(0)
    lengths = rng.uniform(1.0, 10.0, 64)
    bb = BucketBatcher(lengths, batch_size=4, shuffle=True, seed=0,
                       bucket_window_batches=4)
    e1 = [frozenset(b) for b in bb]
    e2 = [frozenset(b) for b in bb]
    assert sorted(i for b in e1 for i in b) == list(range(64))
    assert sorted(i for b in e2 for i in b) == list(range(64))
    assert set(e1) != set(e2)
    # windows bound the length spread: max within-batch length ratio stays
    # far below the unbucketed worst case
    for b in e1:
        ls = lengths[list(b)]
        assert ls.max() / ls.min() < 3.0


def test_mel_noise_differs_across_epochs(corpus):
    """The same host batch must receive different mel noise on every
    featurizer call (round-1 weak #4: key was folded from batch content)."""
    dm = make_module(corpus)
    dm.setup("fit")
    host = collate_host([dm.trainset[i] for i in range(2)])
    feat = Featurizer(mel_noise_scale=0.05, seed=7)
    m1 = np.asarray(feat(host)["mel"])
    m2 = np.asarray(feat(host)["mel"])
    assert not np.allclose(m1, m2)
    # deterministic across runs given the same seed and call index
    feat_b = Featurizer(mel_noise_scale=0.05, seed=7)
    np.testing.assert_allclose(np.asarray(feat_b(host)["mel"]), m1)


def test_dataloader_process_sharding(corpus):
    """Multi-host striding: two simulated processes see disjoint batches
    covering the same epoch, truncated to equal step counts."""
    dm = make_module(corpus)
    dm.setup("fit")
    loads = []
    for p in range(2):
        loader = DataLoader(dm.trainset, batch_size=1, shuffle=False,
                            featurizer=None, num_threads=1,
                            process_index=p, process_count=2)
        assert len(loader) == 2
        loads.append([int(i) for b in iter(loader) for i in b["idx"]])
    assert not set(loads[0]) & set(loads[1])
    assert sorted(loads[0] + loads[1]) == [0, 1, 2, 3]


def test_featurizer_optional_transforms(corpus):
    import jax.numpy as jnp
    root, datasets, phonemizer_cfg = corpus
    dm = make_module(corpus)
    dm.setup("fit")
    items = [dm.trainset[i] for i in range(2)]
    host = collate_host(items)
    feat = Featurizer(mel_fmax=8000.0, mel_noise_scale=0.01,
                      distance_tx_unvoiced=True)
    batch = feat(host)
    f0 = np.asarray(batch["f0"])
    lens = np.asarray(batch["output_lengths"])
    assert np.isfinite(f0).all()
    # distance transform drives unvoiced f0 negative near long gaps... at
    # minimum it never raises values and padding stays exactly zero
    assert np.abs(f0[0, lens[0]:]).max() == 0
    base = dm.featurizer(host)
    assert not np.allclose(np.asarray(batch["mel"])[:, :8],
                           np.asarray(base["mel"])[:, :8])  # noise applied


def test_dense_layer(rng):
    import jax
    import jax.numpy as jnp
    from radmmm_tpu.ops.conv import DenseLayer
    x = jnp.asarray(rng.standard_normal((3, 6)).astype(np.float32))
    mod = DenseLayer(sizes=(8, 4))
    v = mod.init(jax.random.key(0), x)
    out = mod.apply(v, x)
    assert out.shape == (3, 4)
    assert (np.abs(np.asarray(out)) <= 1.0).all()  # tanh range


def test_multihost_shape_grouped_scheduling():
    """With heterogeneous lengths, every multi-host round deals all
    processes batches with the SAME scheduled (B, frames, text) shape —
    the make_array_from_process_local_data requirement — and drops tail
    batches that can't fill a round."""
    from types import SimpleNamespace

    class StubDS:
        sampling_rate = 22050

        def __init__(self, durs, tlens):
            self.data = [SimpleNamespace(duration=d) for d in durs]
            self._tlens = tlens

        def encoded_text_length(self, i):
            return self._tlens[i]

    durs = [1.0] * 8 + [1.1] * 4 + [5.0] * 8
    tlens = [10] * 8 + [12] * 4 + [40] * 8
    scheds = []
    for p in range(2):
        loader = DataLoader(StubDS(durs, tlens), batch_size=4,
                            shuffle=False, featurizer=None, num_threads=1,
                            process_index=p, process_count=2)
        scheds.append(list(loader._my_batches()))
    assert len(scheds[0]) == len(scheds[1]) == 2
    for (i0, s0), (i1, s1) in zip(*scheds):
        assert s0 == s1                       # agreeing global shape
        assert not set(i0) & set(i1)          # disjoint data
    # short utterances land in the 128-frame bucket, long in 448
    assert scheds[0][0][1] == (128, 16)
    assert scheds[0][1][1] == (448, 48)


def test_shape_runs_scheduling():
    """shape_runs=K (single-process megastep scheduling) reorders an
    epoch's batches into consecutive runs of up to K batches sharing one
    pinned scheduled shape, without changing epoch membership."""
    from types import SimpleNamespace

    class StubDS:
        sampling_rate = 22050

        def __init__(self, durs, tlens):
            self.data = [SimpleNamespace(duration=d) for d in durs]
            self._tlens = tlens

        def encoded_text_length(self, i):
            return self._tlens[i]

    # 6 batches of 4: four short-utterance batches, two long
    durs = [1.0] * 16 + [5.0] * 8
    tlens = [10] * 16 + [40] * 8
    loader = DataLoader(StubDS(durs, tlens), batch_size=4, shuffle=False,
                        featurizer=None, num_threads=1, shape_runs=3,
                        process_index=0, process_count=1)
    sched = list(loader._my_batches())
    assert len(sched) == 6                       # membership preserved
    seen = sorted(i for indices, _ in sched for i in indices)
    assert seen == list(range(24))
    for indices, pad_to in sched:
        assert pad_to is not None                # pinned shapes
    # runs: same-shape batches are consecutive, each run <= K
    keys = [pad_to for _, pad_to in sched]
    assert keys == [(128, 16)] * 3 + [(128, 16)] + [(448, 48)] * 2
    # uniform_shape composes: every batch gets the dataset-global shape
    uloader = DataLoader(StubDS(durs, tlens), batch_size=4, shuffle=False,
                         featurizer=None, num_threads=1, shape_runs=3,
                         uniform_shape=True,
                         process_index=0, process_count=1)
    ukeys = [p for _, p in uloader._my_batches()]
    assert ukeys == [(448, 48)] * 6
    # shuffle=True keeps runs intact while permuting run order
    sloader = DataLoader(StubDS(durs, tlens), batch_size=4, shuffle=True,
                         featurizer=None, num_threads=1, shape_runs=3,
                         process_index=0, process_count=1)
    sched_s = list(sloader._my_batches())
    assert sorted(i for idx, _ in sched_s for i in idx) == list(range(24))
    skeys = [p for _, p in sched_s]
    # grouping property: a key with c batches appears in exactly
    # ceil(c/K) maximal runs — interleaving would create more
    runs_per_key: dict = {}
    i = 0
    while i < len(skeys):
        j = i
        while j < len(skeys) and skeys[j] == skeys[i]:
            j += 1
        runs_per_key[skeys[i]] = runs_per_key.get(skeys[i], 0) + 1
        i = j
    for key, n_runs in runs_per_key.items():
        # <=: adjacent same-key runs merge into one maximal run;
        # interleaving would exceed the bound
        assert n_runs <= -(-skeys.count(key) // 3)
