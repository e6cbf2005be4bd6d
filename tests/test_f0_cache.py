"""F0 feature cache: batch-precomputed pYIN, analytic augmentation
transforms, featurizer bypass (reference data.py:491-527 disk cache)."""
import numpy as np
import pytest

from radmmm_tpu.data.collate import collate_host
from radmmm_tpu.data.f0_cache import (build_f0_cache, f0_key,
                                      transform_cached_f0)
from tests.test_data import corpus, make_module


@pytest.fixture(scope="module")
def cache_path(corpus, tmp_path_factory):
    dm = make_module(corpus)
    dm.setup("fit")
    path = str(tmp_path_factory.mktemp("f0cache") / "f0.cache")
    n = build_f0_cache(dm.trainset, path, batch_size=4)
    assert n == len(dm.trainset)
    return path


def test_cached_tracks_match_computed(corpus, cache_path):
    """A cache-fed batch reproduces the compute-path features on valid
    frames (identical audio, identical pYIN; tiny tail differences from
    different padded Viterbi horizons are tolerated)."""
    dm_plain = make_module(corpus)
    dm_plain.setup("fit")
    dm_cached = make_module(corpus, f0_cache_path=cache_path)
    dm_cached.setup("fit")

    items_p = [dm_plain.trainset[i] for i in range(4)]
    items_c = [dm_cached.trainset[i] for i in range(4)]
    assert items_p[0]["cached_f0"] is None
    assert items_c[0]["cached_f0"] is not None

    host_p, host_c = collate_host(items_p), collate_host(items_c)
    assert "cached_f0" not in host_p and "cached_f0" in host_c
    b_p = dm_plain.featurizer(host_p)
    b_c = dm_cached.featurizer(host_c)
    assert "cached_f0" not in b_c       # consumed, not shipped to the step

    lens = np.asarray(b_p["output_lengths"])
    for i in range(4):
        n = lens[i]
        f0p = np.asarray(b_p["f0"])[i, :n]
        f0c = np.asarray(b_c["f0"])[i, :n]
        agree = np.isclose(f0p, f0c, atol=5e-3).mean()
        assert agree > 0.9, (i, agree)
        vp = np.asarray(b_p["voiced_mask"])[i, :n]
        vc = np.asarray(b_c["voiced_mask"])[i, :n]
        assert (vp == vc).mean() > 0.9
        # padding still zero
        assert np.abs(np.asarray(b_c["f0"])[i, n:]).max() == 0
    # mel/energy identical regardless of the cache
    np.testing.assert_allclose(np.asarray(b_p["mel"]),
                               np.asarray(b_c["mel"]), atol=1e-6)


def test_transform_cached_f0():
    track = np.stack([np.linspace(100, 200, 50),
                      np.ones(50), np.full(50, 0.8)]).astype(np.float32)
    # formant shift leaves the track untouched
    same = transform_cached_f0(track, {"formant": 1.1})
    np.testing.assert_array_equal(same, track)
    # pitch scales F0 only
    up = transform_cached_f0(track, {"pitch": 1.25})
    np.testing.assert_allclose(up[0], track[0] * 1.25, rtol=1e-6)
    np.testing.assert_array_equal(up[1:], track[1:])
    # duration resamples the frame axis
    longer = transform_cached_f0(track, {"duration": 1.5})
    assert longer.shape == (3, 75)
    assert abs(longer[0, -1] - track[0, -1]) < 3.0
    shorter = transform_cached_f0(track, {"duration": 0.5})
    assert shorter.shape == (3, 25)


def test_augmented_items_use_transformed_cache(corpus, cache_path):
    """With pitch augmentation on, the item's cached track is the pitch-
    scaled original — matching what pYIN would measure on the shifted
    audio."""
    from radmmm_tpu.native import FeatureCache
    dm = make_module(corpus, f0_cache_path=cache_path,
                     use_wave_augmentations=True,
                     wave_aug_config={
                         "aug_probability": 1.0, "n_augmentations": 1,
                         "use_formant_scaling": False,
                         "use_pitch_scaling": True,
                         "pitch_range": (1.2, 1.2),
                         "use_duration_scaling": False})
    dm.setup("fit")
    item = dm.trainset[0]
    raw = FeatureCache(cache_path).get_array(f0_key(item["audiopath"]))
    cf = item["cached_f0"]
    assert cf is not None
    v = raw[1] > 0
    np.testing.assert_allclose(cf[0][v], raw[0][v] * 1.2, rtol=1e-5)
    # and the analytic track matches pYIN re-measured on the shifted audio
    from radmmm_tpu.data.pitch import pyin_f0
    import jax.numpy as jnp
    T = len(item["audio"])
    pad = ((T + 16383) // 16384) * 16384
    audio = np.zeros((1, pad), np.float32)
    audio[0, :T] = item["audio"]
    f0m, vm, _ = pyin_f0(jnp.asarray(audio))
    n = min(cf.shape[1], np.asarray(f0m).shape[1])
    both = (np.asarray(vm)[0, :n] > 0) & (cf[1, :n] > 0)
    assert both.mean() > 0.5
    med_meas = np.median(np.asarray(f0m)[0, :n][both])
    med_cache = np.median(cf[0, :n][both])
    assert abs(med_meas / med_cache - 1.0) < 0.05
