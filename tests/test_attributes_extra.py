"""LSTMConv backbones + LSTMConvDAP + target transforms."""
import jax
import jax.numpy as jnp
import numpy as np

from radmmm_tpu.models.attributes import (LSTMConv, ResidualLSTMConv,
                                          LSTMConvDAP, tx_target,
                                          inv_tx_target)
from radmmm_tpu.utils.masking import SeqLens


def test_lstm_conv_shapes(rng):
    x = jnp.asarray(rng.standard_normal((2, 10, 6)).astype(np.float32))
    lens = SeqLens.create(jnp.asarray([10, 7]), 10)
    mod = LSTMConv(out_dim=3, n_layers=2, n_channels=8)
    v = mod.init({"params": jax.random.key(0),
                  "dropout": jax.random.key(1)}, x, lens)
    out = mod.apply(v, x, lens, train=False)
    assert out.shape == (2, 10, 3)


def test_residual_lstm_conv(rng):
    x = jnp.asarray(rng.standard_normal((2, 8, 6)).astype(np.float32))
    lens = SeqLens.create(jnp.asarray([8, 8]), 8)
    mod = ResidualLSTMConv(out_dim=6, n_layers=1, n_hidden_channels=8)
    v = mod.init({"params": jax.random.key(0),
                  "dropout": jax.random.key(1)}, x, lens)
    out = mod.apply(v, x, lens, train=False)
    assert out.shape == x.shape


def test_lstm_conv_dap_infer(rng):
    txt = jnp.asarray(rng.standard_normal((2, 9, 16)).astype(np.float32))
    spk = jnp.asarray(rng.standard_normal((2, 4)).astype(np.float32))
    lens = SeqLens.create(jnp.asarray([9, 6]), 9)
    dap = LSTMConvDAP(n_speaker_dim=4, in_dim=16, out_dim=1,
                      reduction_factor=2, n_backbone_layers=1, n_hidden=8,
                      log_target=True)
    tgt = jnp.asarray(rng.uniform(1, 5, (2, 9, 1)).astype(np.float32))
    v = dap.init({"params": jax.random.key(0),
                  "dropout": jax.random.key(1)}, tgt, txt, spk, lens)
    out = dap.apply(v, tgt, txt, spk, lens, train=False)
    np.testing.assert_allclose(np.asarray(out["x"]),
                               np.log(np.asarray(tgt) + 1), rtol=1e-5)
    pred = dap.apply(v, txt, spk, lens, method=LSTMConvDAP.infer)
    assert pred.shape == (2, 9, 1)


def test_target_transforms_roundtrip(rng):
    x = jnp.asarray(rng.uniform(0.5, 4.0, (3, 7, 1)).astype(np.float32))
    for kw in [dict(target_scale=2.0, target_offset=-1.0),
               dict(log_target=True),
               dict(normalize_target=True,
                    normalization_type="norm_log_space")]:
        mean = jnp.asarray([1.0, 2.0, 3.0])
        std = jnp.asarray([0.5, 0.4, 0.3])
        y = tx_target(x, x_mean=mean, x_std=std, **kw)
        back = inv_tx_target(y, x_mean=mean, x_std=std, **kw)
        np.testing.assert_allclose(np.asarray(back), np.asarray(x),
                                   rtol=1e-4, atol=1e-5)
