"""Checkpointing with orbax: step-based saves + submodule compose/freeze.

Mirrors the reference's checkpoint protocol (SURVEY.md §5):
* step-based saves every `iters_per_checkpoint`
  (`latest-epoch_{e}-iter_{step}` naming becomes orbax step dirs),
* partial loading: `decoder_path` / `encoders_path` pull named submodule
  params from another run's checkpoint and freeze them
  (tts_lightning_modules.py:217-237),
* on save, pretrained (frozen) submodules are dropped from the state dict;
  on load, missing subtrees are backfilled from the live model
  (on_save_checkpoint/on_load_checkpoint, tts_lightning_modules.py:514-540).

Freezing is implemented functionally: `frozen_param_mask` labels subtrees
and the optimizer is wrapped so frozen leaves get zero updates.
"""
from __future__ import annotations

import dataclasses
import os
from typing import Any, Dict, List, Optional, Sequence

import jax
import numpy as np
import optax
import orbax.checkpoint as ocp

ENCODER_SUBMODULES = ("text_embeddings", "text_encoder",
                      "speaker_embeddings", "attention",
                      "accent_embeddings")


class CheckpointManager:
    def __init__(self, directory: str, max_to_keep: Optional[int] = None):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        options = ocp.CheckpointManagerOptions(max_to_keep=max_to_keep,
                                               create=True)
        self.mgr = ocp.CheckpointManager(self.directory, options=options)

    def save(self, step: int, state, exclude_prefixes: Sequence[str] = ()):
        """Save TrainState; frozen/pretrained subtrees are dropped
        (on_save_checkpoint semantics)."""
        payload = dataclasses.asdict(state) if dataclasses.is_dataclass(
            state) else dict(state)
        if exclude_prefixes:
            payload["params"] = {
                k: v for k, v in payload["params"].items()
                if k not in exclude_prefixes}
        self.mgr.save(step, args=ocp.args.StandardSave(payload))
        self.mgr.wait_until_finished()

    def latest_step(self) -> Optional[int]:
        return self.mgr.latest_step()

    def restore(self, state, step: Optional[int] = None):
        """Restore into the given template state; subtrees missing from the
        checkpoint keep their live values (on_load_checkpoint semantics,
        tts_lightning_modules.py:523-540)."""
        step = step if step is not None else self.mgr.latest_step()
        if step is None:
            return state, None
        template = dataclasses.asdict(state)
        # subtrees dropped at save time (pretrained/frozen) are absent from
        # the on-disk tree; restore only what exists, keep live values for
        # the rest
        meta = self.mgr.item_metadata(step)
        meta_tree = getattr(meta, "tree", meta)
        if isinstance(meta_tree, dict) and "params" in meta_tree:
            on_disk = set(meta_tree["params"].keys())
            skipped = {k: v for k, v in template["params"].items()
                       if k not in on_disk}
            template["params"] = {k: v for k, v in template["params"].items()
                                  if k in on_disk}
        else:
            skipped = {}
        item = self.mgr.restore(
            step, args=ocp.args.StandardRestore(template, strict=False))
        merged_params = dict(item["params"])
        for k, v in skipped.items():
            print(f"Module {k} not loaded from checkpoint")
            merged_params[k] = v
        item["params"] = merged_params
        restored = type(state)(**{
            f.name: item[f.name] for f in dataclasses.fields(state)})
        return restored, step


def load_pretrained_submodules(params: Dict[str, Any], checkpoint_path: str,
                               submodule_names: Sequence[str]
                               ) -> Dict[str, Any]:
    """Copy named top-level param subtrees from another checkpoint
    (load_pretrained_submodules, tts_lightning_modules.py:477-497)."""
    ckptr = ocp.StandardCheckpointer()
    restored = ckptr.restore(os.path.abspath(checkpoint_path))
    src = restored.get("params", restored)
    out = dict(params)
    for name in submodule_names:
        if name in src:
            out[name] = jax.tree_util.tree_map(jnp_array, src[name])
    return out


def jnp_array(x):
    import jax.numpy as jnp
    return jnp.asarray(x)


def frozen_param_mask(params: Dict[str, Any],
                      frozen_prefixes: Sequence[str]):
    """Pytree of bools: True where the param is frozen."""
    def label(path, _):
        top = path[0].key if hasattr(path[0], "key") else str(path[0])
        return top in frozen_prefixes

    return jax.tree_util.tree_map_with_path(label, params)


def freeze_wrap(tx: optax.GradientTransformation, params,
                frozen_prefixes: Sequence[str]
                ) -> optax.GradientTransformation:
    """Zero updates for frozen subtrees (functional equivalent of
    utils.freeze, utils.py:36)."""
    if not frozen_prefixes:
        return tx
    mask = frozen_param_mask(params, frozen_prefixes)
    return optax.chain(
        optax.masked(optax.set_to_zero(), mask),
        optax.masked(tx, jax.tree_util.tree_map(lambda b: not b, mask)),
    )
