"""Native C++ components: feature cache roundtrip, MAS parity vs kernels."""
import os

import jax.numpy as jnp
import numpy as np
import pytest

from radmmm_tpu import native
from radmmm_tpu.ops.alignment import mas_width1, mas_width1_ref
from tests.test_alignment import soft_attn


def test_native_builds():
    so = native.build_native()
    assert os.path.exists(so)


def test_feature_cache_roundtrip(tmp_path, rng):
    path = str(tmp_path / "cache")
    arrs = {f"utt{i}": rng.standard_normal((80, 10 + i)).astype(np.float32)
            for i in range(20)}
    with native.FeatureCacheWriter(path) as w:
        for k, a in arrs.items():
            w.put_array(k, a)
        w.put("raw", b"hello bytes")
    with native.FeatureCache(path) as c:
        assert len(c) == 21
        for k, a in arrs.items():
            np.testing.assert_array_equal(c.get_array(k), a)
        assert c.get("raw") == b"hello bytes"
        assert c.get("missing") is None
        assert c.get_array("nope") is None


def test_cache_concurrent_reads(tmp_path, rng):
    from concurrent.futures import ThreadPoolExecutor
    path = str(tmp_path / "cc")
    with native.FeatureCacheWriter(path) as w:
        for i in range(50):
            w.put(f"k{i}", bytes([i]) * (i + 1))
    with native.FeatureCache(path) as c:
        def read(i):
            return c.get(f"k{i}")
        with ThreadPoolExecutor(8) as pool:
            results = list(pool.map(read, range(50)))
        for i, r in enumerate(results):
            assert r == bytes([i]) * (i + 1)


def test_mas_cpu_matches_python_oracle(rng):
    B, T_mel, T_text = 4, 41, 13
    attn = soft_attn(rng, B, T_mel, T_text)
    text_lens = np.array([13, 9, 7, 5], np.int32)
    mel_lens = np.array([41, 30, 22, 11], np.int32)
    got = native.mas_batch_cpu(attn, text_lens, mel_lens)
    for b in range(B):
        want = mas_width1_ref(attn[b, :mel_lens[b], :text_lens[b]])
        np.testing.assert_array_equal(got[b, :mel_lens[b], :text_lens[b]],
                                      want, err_msg=f"item {b}")
        assert got[b, mel_lens[b]:].sum() == 0
        assert got[b, :, text_lens[b]:].sum() == 0


def test_mas_cpu_matches_device_kernel(rng):
    B, T_mel, T_text = 3, 57, 17
    attn = soft_attn(rng, B, T_mel, T_text)
    text_lens = np.array([17, 12, 8], np.int32)
    mel_lens = np.array([57, 40, 21], np.int32)
    cpu = native.mas_batch_cpu(attn, text_lens, mel_lens)
    dev = np.asarray(mas_width1(jnp.asarray(attn), jnp.asarray(text_lens),
                                jnp.asarray(mel_lens)))
    np.testing.assert_array_equal(cpu, dev)
