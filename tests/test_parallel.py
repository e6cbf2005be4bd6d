"""Mesh/sharding rules: TP specs for WN kernels, replication elsewhere."""
import jax
import numpy as np
from jax.sharding import PartitionSpec as P

from radmmm_tpu.parallel.mesh import (make_mesh, param_spec, batch_sharding,
                                      variables_shardings)


def test_param_spec_rules():
    w = np.zeros((5, 1136, 1024))
    assert param_spec("decoder/flow_0/coupling/wn/in_2/v", w, 2) == \
        P(None, None, "model")
    g = np.zeros((1024,))
    assert param_spec("decoder/flow_0/coupling/wn/in_2/g", g, 2) == \
        P("model")
    end = np.zeros((1, 1024, 160))
    assert param_spec("decoder/flow_3/coupling/wn/end/v", end, 2) == \
        P(None, "model", None)
    # non-matching params replicate
    assert param_spec("text_encoder/conv_0/v", w, 2) == P()
    # indivisible dims fall back to replication
    odd = np.zeros((5, 7, 1023))
    assert param_spec("decoder/flow_0/coupling/wn/in_0/v", odd, 2) == P()
    # TP disabled -> replicate everything
    assert param_spec("decoder/flow_0/coupling/wn/in_2/v", w, 1) == P()


def test_mesh_and_shardings():
    mesh = make_mesh(n_data=4, n_model=2)
    assert dict(mesh.shape) == {"data": 4, "model": 2}
    bs = batch_sharding(mesh)
    assert bs.spec == P("data")
    params = {"decoder": {"flow_0": {"coupling": {"wn": {"in_0": {
        "v": np.zeros((5, 256, 256))}}}}},
        "text_embeddings": {"embedding": np.zeros((10, 4))}}
    sh = variables_shardings(params, mesh)
    wn_spec = sh["decoder"]["flow_0"]["coupling"]["wn"]["in_0"]["v"].spec
    assert wn_spec == P(None, None, "model")
    assert sh["text_embeddings"]["embedding"].spec == P()
