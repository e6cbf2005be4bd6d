"""Training: RAdam parity, overfit smoke test, 8-device data-parallel step."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from radmmm_tpu.models.tts import TTSModel
from radmmm_tpu.parallel import mesh as pmesh
from radmmm_tpu.training.optim import radam_exact, build_optimizer
from radmmm_tpu.training.step import (LossConfig, create_train_state,
                                      make_train_step, make_val_step,
                                      make_whitening_init, phase_flags)
from tests.test_tts_model import tiny_config, tiny_batch


def radam_oracle_step(p, g, m, v, t, lr=0.01, b1=0.9, b2=0.999, eps=1e-8,
                      wd=0.0):
    """Numpy oracle of the original RAdam update (radam.py:63-142)."""
    import math
    v = b2 * v + (1 - b2) * g * g
    m = b1 * m + (1 - b1) * g
    beta2_t = b2 ** t
    n_sma_max = 2 / (1 - b2) - 1
    n_sma = n_sma_max - 2 * t * beta2_t / (1 - beta2_t)
    if n_sma >= 5:
        step_size = lr * math.sqrt(
            (1 - beta2_t) * (n_sma - 4) / (n_sma_max - 4) * (n_sma - 2)
            / n_sma * n_sma_max / (n_sma_max - 2)) / (1 - b1 ** t)
    else:
        step_size = lr / (1 - b1 ** t)
    if wd != 0:
        p = p - wd * lr * p
    if n_sma >= 5:
        p = p - step_size * m / (np.sqrt(v) + eps)
    else:
        p = p - step_size * m
    return p, m, v


def test_radam_matches_oracle():
    rng = np.random.default_rng(0)
    p0 = rng.standard_normal(5).astype(np.float32)
    grads = [rng.standard_normal(5).astype(np.float32) for _ in range(12)]

    tx = radam_exact(0.01, weight_decay=0.001)
    opt_state = tx.init(jnp.asarray(p0))
    p = jnp.asarray(p0)
    p_ref, m, v = p0.astype(np.float64), np.zeros(5), np.zeros(5)
    for t, g in enumerate(grads, start=1):
        upd, opt_state = tx.update(jnp.asarray(g), opt_state, p)
        p = p + upd
        p_ref, m, v = radam_oracle_step(p_ref, g.astype(np.float64), m, v, t,
                                        lr=0.01, wd=0.001)
        np.testing.assert_allclose(np.asarray(p), p_ref, atol=1e-5,
                                   err_msg=f"step {t}")


def test_overfit_single_batch(rng):
    """Loss must decrease markedly when overfitting one tiny batch —
    the reference's overfit_batches debugging idiom (SURVEY.md §4)."""
    model = TTSModel(config=tiny_config())
    # enough mel frames that the whitening covariance (16 grouped dims) is
    # well-conditioned: (48+42)//2 = 45 valid grouped frames
    batch = tiny_batch(rng, T_mel=48)
    tx = build_optimizer("RAdam", learning_rate=5e-3, grad_clip_val=1.0)
    state = create_train_state(model, tx, batch, jax.random.key(0))

    whiten = jax.jit(make_whitening_init(model))
    state = whiten(state, batch)

    cfg = LossConfig(n_group_size=2, cross_covariance_weight=1.0,
                     speaker_reg={"variance": 0.0, "covariance": 0.0})
    step_fn = jax.jit(make_train_step(model, cfg, tx, binarize=False,
                                      kl_on=False))
    losses = []
    key = jax.random.key(1)
    for i in range(30):
        key, sub = jax.random.split(key)
        state, metrics = step_fn(state, batch, sub)
        losses.append(float(metrics["loss_mel"]))
    assert losses[-1] < losses[0] - 0.2, losses[::6]
    assert np.isfinite(losses).all()

    # phase switch: binarized step compiles and runs too
    bin_step = jax.jit(make_train_step(model, cfg, tx, binarize=True,
                                       kl_on=True))
    state, metrics = bin_step(state, batch, key)
    assert float(metrics["binarization_loss"]) > 0
    # val step
    val = jax.jit(make_val_step(model, cfg))
    vm = val(state, batch)
    assert np.isfinite(float(vm["loss"]))


def test_phase_flags():
    cfg = LossConfig(binarization_start_iter=10, kl_loss_start_iter=20)
    assert phase_flags(0, cfg) == (False, False)
    assert phase_flags(10, cfg) == (True, False)
    assert phase_flags(21, cfg) == (True, True)


def test_data_parallel_step_8_devices(rng):
    """Full train step jitted over an 8-device mesh with the batch sharded
    on `data`: must compile, run, and match the single-device result."""
    model = TTSModel(config=tiny_config())
    batch = tiny_batch(rng, B=8)
    batch["input_lengths"] = jnp.asarray([7, 5, 7, 6, 7, 5, 6, 7], jnp.int32)
    batch["output_lengths"] = jnp.asarray([16, 10, 16, 12, 14, 10, 12, 16],
                                          jnp.int32)
    batch["speaker_ids"] = jnp.asarray([0, 1, 2, 0, 1, 2, 0, 1], jnp.int32)
    batch["accent_ids"] = jnp.asarray([0, 1, 0, 1, 0, 1, 0, 1], jnp.int32)
    batch["speaker_f0_mean"] = jnp.full((8,), 5.0)
    batch["speaker_f0_std"] = jnp.full((8,), 0.3)

    tx = build_optimizer("RAdam", learning_rate=1e-3)
    state = create_train_state(model, tx, batch, jax.random.key(0))
    cfg = LossConfig(n_group_size=2)
    step = make_train_step(model, cfg, tx, binarize=False, kl_on=False)

    # single device reference
    s1, m1 = jax.jit(step)(state, batch, jax.random.key(2))

    mesh = pmesh.make_mesh(n_data=8, n_model=1)
    sharded_batch = pmesh.shard_batch(batch, mesh)
    rep = pmesh.replicated(mesh)
    state_sh = jax.device_put(state, rep)
    with jax.set_mesh(mesh):
        s8, m8 = jax.jit(step)(state_sh, sharded_batch,
                               jax.device_put(jax.random.key(2), rep))
    np.testing.assert_allclose(float(m8["loss"]), float(m1["loss"]),
                               rtol=2e-3)
    # params updated identically (spot check one leaf)
    l1 = np.asarray(s1.params["text_embeddings"]["embedding"])
    l8 = np.asarray(s8.params["text_embeddings"]["embedding"])
    np.testing.assert_allclose(l8, l1, atol=2e-4)


def test_megastep_matches_sequential_steps():
    """make_train_megastep (K raw batches featurized+trained inside one
    lax.scan) must reproduce K sequential featurize_raw + train_step calls
    with the same key schedule — the one-dispatch product loop can't change
    the math."""
    from radmmm_tpu.data.collate import Featurizer, collate_host
    from radmmm_tpu.training.step import (make_train_megastep,
                                          stack_raw_batches)

    feat = Featurizer(filter_length=256, hop_length=64, win_length=256,
                      n_mel_channels=8, sampling_rate=22050,
                      f0_min=120.0, f0_max=500.0, f0_method="yin")
    rng = np.random.default_rng(3)
    K, B, S, T_text = 2, 2, 4096, 7

    def host_batch(i):
        items = []
        for b in range(B):
            t = np.arange(S - 300 * b, dtype=np.float32) / 22050.0
            audio = 0.3 * np.sin(2 * np.pi * 220.0 * (1 + 0.1 * b + i) * t)
            audio += 0.01 * rng.standard_normal(audio.size)
            items.append({
                "audio": audio.astype(np.float32),
                "text_encoded": rng.integers(0, 30, (T_text - b,)),
                "speaker_id": b, "accent_id": b % 2,
                "speaker_f0_mean": 5.0, "speaker_f0_std": 0.3,
                "speaker_energy_mean": 0.5, "speaker_energy_std": 0.15,
                "audiopath": f"u{i}_{b}.wav", "text_raw": "x",
                "language": "en_US", "idx": i * B + b,
            })
        return collate_host(items, hop_length=64)

    raws = [feat.raw_arrays(host_batch(i)) for i in range(K)]

    model = TTSModel(config=tiny_config())
    tx = build_optimizer("RAdam", learning_rate=1e-3)
    cfg = LossConfig(n_group_size=2)
    key = jax.random.key(11)

    batch0 = feat.featurize_raw(jax.tree.map(jnp.asarray, raws[0]),
                                jax.random.key(0))
    state = create_train_state(model, tx, batch0, jax.random.key(0))

    mega = jax.jit(make_train_megastep(model, cfg, tx, feat,
                                       binarize=False, kl_on=False))
    s_mega, metrics = mega(state, stack_raw_batches(raws), key)
    assert np.asarray(metrics["loss"]).shape == (K,)

    # sequential reference with the megastep's exact key schedule: dropout
    # keys fold the call key per scan index; mel-noise keys come from the
    # featurizer's (seed, process, global step) stream — identical to the
    # trainer's per-batch fallback path (ADVICE r4)
    step = jax.jit(make_train_step(model, cfg, tx, binarize=False,
                                   kl_on=False))
    s_seq, seq_losses = state, []
    for i, raw in enumerate(raws):
        dkey = jax.random.fold_in(key, i)
        fkey = feat.noise_key_for_step(int(s_seq.step))
        batch = feat.featurize_raw(jax.tree.map(jnp.asarray, raw), fkey)
        s_seq, m = step(s_seq, batch, dkey)
        seq_losses.append(float(m["loss"]))

    np.testing.assert_allclose(np.asarray(metrics["loss"]),
                               np.asarray(seq_losses), rtol=2e-5, atol=2e-5)
    leaves_m = jax.tree_util.tree_leaves_with_path(s_mega.params)
    leaves_s = dict(jax.tree_util.tree_leaves_with_path(s_seq.params))
    for path, lm in leaves_m:
        np.testing.assert_allclose(
            np.asarray(lm), np.asarray(leaves_s[path]), rtol=2e-5,
            atol=2e-5, err_msg=jax.tree_util.keystr(path))
    assert int(s_mega.step) == int(state.step) + K
