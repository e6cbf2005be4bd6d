"""Checkpointing: save/restore roundtrip, pretrained exclude+backfill,
freeze semantics."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from radmmm_tpu.models.tts import TTSModel
from radmmm_tpu.training.optim import build_optimizer
from radmmm_tpu.training.step import (LossConfig, create_train_state,
                                      make_train_step)
from radmmm_tpu.utils.checkpoint import (CheckpointManager, freeze_wrap,
                                         frozen_param_mask)
from tests.test_tts_model import tiny_config, tiny_batch


def make_state(rng):
    model = TTSModel(config=tiny_config())
    batch = tiny_batch(rng)
    tx = build_optimizer("RAdam", learning_rate=0.1)
    state = create_train_state(model, tx, batch, jax.random.key(0))
    return model, tx, state, batch


def tree_equal(a, b):
    la = jax.tree_util.tree_leaves(a)
    lb = jax.tree_util.tree_leaves(b)
    return all(np.array_equal(np.asarray(x), np.asarray(y))
               for x, y in zip(la, lb))


def test_save_restore_roundtrip(tmp_path, rng):
    model, tx, state, batch = make_state(rng)
    mgr = CheckpointManager(str(tmp_path / "ckpt"))
    mgr.save(7, state)
    assert mgr.latest_step() == 7

    # perturb, then restore into the perturbed template
    perturbed = dataclasses.replace(
        state, params=jax.tree_util.tree_map(lambda x: x + 1.0,
                                             state.params))
    restored, step = mgr.restore(perturbed)
    assert step == 7
    assert tree_equal(restored.params, state.params)
    assert tree_equal(restored.opt_state, state.opt_state)


def test_exclude_and_backfill(tmp_path, rng):
    """Frozen submodules are dropped on save and backfilled from the live
    model on load (tts_lightning_modules.py:514-540 semantics)."""
    model, tx, state, batch = make_state(rng)
    mgr = CheckpointManager(str(tmp_path / "ckpt"))
    mgr.save(3, state, exclude_prefixes=["decoder"])

    live = dataclasses.replace(
        state, params={**state.params,
                       "decoder": jax.tree_util.tree_map(
                           lambda x: x * 2.0, state.params["decoder"]),
                       "attention": jax.tree_util.tree_map(
                           lambda x: x * 3.0, state.params["attention"])})
    restored, step = mgr.restore(live)
    # decoder missing from ckpt -> keeps live (x2) values
    assert tree_equal(restored.params["decoder"], live.params["decoder"])
    # attention present in ckpt -> restored to saved values
    assert tree_equal(restored.params["attention"],
                      state.params["attention"])


def test_freeze_wrap_blocks_updates(rng):
    model, tx, state, batch = make_state(rng)
    frozen = ["decoder"]
    ftx = freeze_wrap(tx, state.params, frozen)
    state = dataclasses.replace(state, opt_state=ftx.init(state.params))
    cfg = LossConfig(n_group_size=2)
    step = jax.jit(make_train_step(model, cfg, ftx, binarize=False,
                                   kl_on=False))
    new_state, _ = step(state, batch, jax.random.key(1))
    # frozen decoder unchanged; trainable encoder moved
    assert tree_equal(new_state.params["decoder"], state.params["decoder"])
    moved = not tree_equal(new_state.params["text_encoder"],
                           state.params["text_encoder"])
    assert moved
    mask = frozen_param_mask(state.params, frozen)
    assert all(jax.tree_util.tree_leaves(mask["decoder"]))
    assert not any(jax.tree_util.tree_leaves(mask["text_encoder"]))


def test_ckpt_path_restore_variants(tmp_path, rng):
    """--ckpt_path accepts an integer step (non-latest resume), a run dir,
    an explicit orbax step dir, and fails loudly on bogus paths
    (reference README.md:70-80 resume/predict protocol)."""
    import pytest
    from radmmm_tpu.training.loop import Trainer, TrainerConfig
    model, tx, state, batch = make_state(rng)
    run = tmp_path / "runA"
    mgr = CheckpointManager(str(run / "ckpt"))
    mgr.save(2, state)
    bumped = dataclasses.replace(
        state, params=jax.tree_util.tree_map(lambda x: x + 1.0,
                                             state.params))
    mgr.save(5, bumped)

    def trainer_with(ckpt_path, outdir):
        tc = TrainerConfig(output_directory=str(outdir),
                           ckpt_path=ckpt_path)
        return Trainer(tiny_config(), LossConfig(n_group_size=2), tc)

    def leaf(s):
        return np.asarray(s.params["text_embeddings"]["embedding"])

    # default: latest step from this run's own dir
    t = trainer_with(None, run)
    got, step = t._restore_state(state)
    assert step == 5 and np.allclose(leaf(got), leaf(bumped))

    # integer step: resume from a non-latest checkpoint
    t = trainer_with("2", run)
    got, step = t._restore_state(state)
    assert step == 2 and np.allclose(leaf(got), leaf(state))

    # another run's directory -> its latest step
    t = trainer_with(str(run), tmp_path / "runB")
    got, step = t._restore_state(state)
    assert step == 5 and np.allclose(leaf(got), leaf(bumped))

    # explicit orbax step dir
    t = trainer_with(str(run / "ckpt" / "2"), tmp_path / "runC")
    got, step = t._restore_state(state)
    assert step == 2 and np.allclose(leaf(got), leaf(state))

    # require=True with no checkpoint anywhere -> loud failure
    t = trainer_with(None, tmp_path / "runD")
    with pytest.raises(FileNotFoundError):
        t._restore_state(state, require=True)

    # nonexistent explicit path -> loud failure (not silent-latest)
    t = trainer_with(str(tmp_path / "nope"), tmp_path / "runE")
    with pytest.raises(FileNotFoundError):
        t._restore_state(state)
