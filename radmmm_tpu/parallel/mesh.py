"""Device mesh + sharding layout for data/tensor-parallel training.

TPU-native replacement for the reference's PyTorch-Lightning DDP/NCCL stack
(configs/RADMMM_train_config.yaml:27-30, SURVEY.md §2.7): a
jax.sharding.Mesh with a `data` axis (DDP equivalent — batch sharded,
params replicated, gradient reduction inserted by XLA from the global-mean
loss) and an optional `model` axis that shards the widest flow-coupling
kernels (the WN 1024-channel convs) so GSPMD splits those matmuls across
chips over ICI.

Scaling across hosts uses the same code path: jax.distributed.initialize()
then devices() spans all processes, and jit handles host-local batch shards.
"""
from __future__ import annotations

import re
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(n_data: Optional[int] = None, n_model: int = 1,
              devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if n_data is None:
        n_data = n // n_model
    need = n_data * n_model
    assert need <= n, (n_data, n_model, n)
    arr = np.asarray(devices[:need]).reshape(n_data, n_model)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading (batch) dim split over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def shard_batch(batch: dict, mesh: Mesh) -> dict:
    """Split the batch's leading dim over the data axis.

    Single-host: a plain device_put with a NamedSharding. Multi-host (after
    jax.distributed.initialize, the DDP-launch equivalent): each process
    holds a *different* host-local batch; the global array is assembled from
    the per-process shards over ICI/DCN, so the global batch is
    B_local x n_processes — the same per-device batch semantics as the
    reference's Lightning DDP (configs/RADMMM_train_config.yaml:27-30).
    """
    s = batch_sharding(mesh)
    multi_host = jax.process_count() > 1

    def put(x):
        if not (hasattr(x, "ndim") and x.ndim >= 1):
            return x
        if multi_host:
            return jax.make_array_from_process_local_data(s, np.asarray(x))
        return jax.device_put(x, s)

    return jax.tree_util.tree_map(put, batch)


def shard_state(state, mesh: Mesh, tx=None):
    """Lay a TrainState out over the mesh: params by the TP rules, small
    collections replicated. Optimizer moment pytrees (RAdam m/v mirror the
    params) inherit each param's layout — derived by jitting ``tx.init`` on
    the sharded params and reusing its output shardings, so restored
    optimizer state keeps its values but moves to the right layout."""
    import dataclasses

    param_sh = variables_shardings(state.params, mesh)
    rep = replicated(mesh)
    params = jax.device_put(state.params, param_sh)
    opt_state = state.opt_state
    if tx is not None:
        with jax.set_mesh(mesh):
            ref_opt = jax.jit(tx.init)(params)
        opt_sh = jax.tree_util.tree_map(lambda x: x.sharding, ref_opt)
        opt_state = jax.tree_util.tree_map(
            jax.device_put, opt_state, opt_sh)
    else:
        opt_state = jax.tree_util.tree_map(
            lambda x: jax.device_put(x, rep), opt_state)
    return dataclasses.replace(
        state,
        params=params,
        buffers=jax.device_put(state.buffers, rep),
        batch_stats=jax.device_put(state.batch_stats, rep),
        spectral=jax.device_put(state.spectral, rep),
        opt_state=opt_state,
        step=jax.device_put(state.step, rep),
    )


# Params whose widest dim rides the model axis. The WN stacks inside the 8
# flow steps carry most FLOPs/bytes (SURVEY.md §3.1 "dominant GPU cost") —
# shard their 1024-channel hidden dim; GSPMD propagates the layout through
# the convs and inserts the (ICI) collectives.
_TP_RULES = [
    # (path regex, partition spec for a (K, Cin, Cout) conv kernel)
    (re.compile(r"flow_\d+/coupling/wn/(start|in_\d+)/(v|kernel)$"),
     P(None, None, MODEL_AXIS)),
    (re.compile(r"flow_\d+/coupling/wn/(start|in_\d+)/(g|bias)$"),
     P(MODEL_AXIS)),
    (re.compile(r"flow_\d+/coupling/wn/res_skip_\d+/(v|kernel)$"),
     P(None, None, MODEL_AXIS)),
    (re.compile(r"flow_\d+/coupling/wn/res_skip_\d+/(g|bias)$"),
     P(MODEL_AXIS)),
    (re.compile(r"flow_\d+/coupling/wn/end/(v|kernel)$"),
     P(None, MODEL_AXIS, None)),
]


def param_spec(path: str, value, n_model: int) -> P:
    """PartitionSpec for one param; replicated unless a TP rule matches and
    the sharded dim is divisible by the model-axis size."""
    if n_model > 1:
        for rx, spec in _TP_RULES:
            if rx.search(path):
                ok = True
                for dim, axis in enumerate(spec):
                    if axis is not None and value.shape[dim] % n_model != 0:
                        ok = False
                if ok:
                    return spec
    return P()


def _flatten_path(path) -> str:
    parts = []
    for p in path:
        if hasattr(p, "key"):
            parts.append(str(p.key))
        elif hasattr(p, "idx"):
            parts.append(str(p.idx))
        else:
            parts.append(str(p))
    return "/".join(parts)


def variables_shardings(variables, mesh: Mesh):
    """NamedSharding pytree for a model variable collection dict."""
    n_model = mesh.shape[MODEL_AXIS]

    def one(path, v):
        spec = param_spec(_flatten_path(path), v, n_model)
        return NamedSharding(mesh, spec)

    return jax.tree_util.tree_map_with_path(one, variables)


def replicated(mesh: Mesh):
    return NamedSharding(mesh, P())
