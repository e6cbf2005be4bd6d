"""Coupling layers: zero-init identity, invertibility, masking, logdet."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from radmmm_tpu.ops.coupling import (WN, SimpleConvNet, FiLMStack,
                                     AffineCoupling, SplineCoupling,
                                     SplineCouplingAR, scaling_and_logs)
from radmmm_tpu.utils.masking import SeqLens


def batch(rng, B=2, T=12, C=8, Cctx=6):
    z = rng.standard_normal((B, T, C)).astype(np.float32)
    ctx = rng.standard_normal((B, T, Cctx)).astype(np.float32)
    lens = SeqLens.create(jnp.asarray(np.array([T, T - 4], np.int32)[:B]), T)
    return jnp.asarray(z), jnp.asarray(ctx), lens


def test_wn_zero_init_outputs_zero(rng):
    z, ctx, lens = batch(rng)
    wn = WN(n_in_channels=4, n_layers=2, n_channels=16)
    p = wn.init(jax.random.key(0), z[..., :4], ctx, lens.mask)
    out = wn.apply(p, z[..., :4], ctx, lens.mask)
    assert out.shape == (2, 12, 8)
    np.testing.assert_allclose(np.asarray(out), 0.0)  # zero-init end layer


def test_affine_coupling_identity_at_init_tanh(rng):
    z, ctx, lens = batch(rng)
    layer = AffineCoupling(n_mel_channels=8, n_layers=2, scaling_fn="tanh",
                           n_channels=16, use_partial_padding=True)
    p = layer.init(jax.random.key(0), z, ctx, lens.mask)
    out, log_s = layer.apply(p, z, ctx, lens.mask)
    # zero-init end conv -> s = tanh(0)+1+1e-6 ~ 1, b = 0 -> identity
    np.testing.assert_allclose(np.asarray(out), np.asarray(z), atol=1e-4)
    np.testing.assert_allclose(np.asarray(log_s), np.log(1 + 1e-6), atol=1e-6)


@pytest.mark.parametrize("model", ["wavenet", "simple_conv", "film_stack"])
@pytest.mark.parametrize("scaling", ["tanh", "exp", "sigmoid", "translate"])
def test_affine_coupling_invertible(rng, model, scaling):
    z, ctx, lens = batch(rng)
    layer = AffineCoupling(n_mel_channels=8, n_layers=2, affine_model=model,
                           scaling_fn=scaling, n_channels=16)
    variables = layer.init(jax.random.key(0), z, ctx, lens.mask)
    # randomize the (zero-init) last layers so the transform is nontrivial
    variables = jax.tree_util.tree_map(
        lambda a: a + 0.05 * jax.random.normal(jax.random.key(1), a.shape),
        variables)
    fwd = layer.apply(variables, z, ctx, lens.mask, train=False,
                      mutable=["batch_stats"])
    (out, log_s) = fwd[0] if isinstance(fwd, tuple) and len(fwd) == 2 and \
        isinstance(fwd[0], tuple) else fwd
    back = layer.apply(variables, out, ctx, lens.mask, inverse=True,
                       train=False, mutable=["batch_stats"])
    z2 = back[0] if isinstance(back, tuple) else back
    np.testing.assert_allclose(np.asarray(z2), np.asarray(z), atol=1e-3)


def test_affine_logdet_matches_autodiff(rng):
    """Σ log_s over transformed half == logdet of the full jacobian row-block."""
    z, ctx, lens = batch(rng, B=1, T=4, C=6)
    layer = AffineCoupling(n_mel_channels=6, n_layers=1, scaling_fn="exp",
                           n_channels=8)
    variables = layer.init(jax.random.key(0), z, ctx, lens.mask)
    variables = jax.tree_util.tree_map(
        lambda a: a + 0.05 * jax.random.normal(jax.random.key(1), a.shape),
        variables)

    def f(zf):
        out, _ = layer.apply(variables, zf.reshape(1, 4, 6), ctx,
                             lens.mask)
        return out.reshape(-1)

    J = np.asarray(jax.jacfwd(f)(z.reshape(-1)))
    want = np.linalg.slogdet(J)[1]
    _, log_s = layer.apply(variables, z, ctx, lens.mask)
    got = float(np.asarray(log_s).sum())
    np.testing.assert_allclose(got, want, atol=1e-3)


def test_spline_coupling_invertible(rng):
    z, ctx, lens = batch(rng)
    z = jnp.clip(z, -2.5, 2.5)
    layer = SplineCoupling(n_mel_channels=8, n_layers=2, n_bins=8,
                           left=-3, right=3, bottom=-3, top=3,
                           use_quadratic=True, use_bn=False)
    variables = layer.init(jax.random.key(0), z, ctx, lens.mask)
    variables = jax.tree_util.tree_map(
        lambda a: a + 0.03 * jax.random.normal(jax.random.key(1), a.shape),
        variables)
    out, log_s = layer.apply(variables, z, ctx, lens.mask, train=False)
    z2 = layer.apply(variables, out, ctx, lens.mask, inverse=True,
                     train=False)
    np.testing.assert_allclose(np.asarray(z2), np.asarray(z), atol=1e-3)
    assert log_s.shape == (2, 12, 1)


def test_spline_coupling_ar_roundtrip(rng):
    z, ctx, lens = batch(rng, C=4)
    z = jnp.clip(z, -2.0, 2.0)
    layer = SplineCouplingAR(n_in_channels=4, n_layers=2, n_bins=8,
                             left=-3, right=3, bottom=-3, top=3,
                             use_quadratic=True)
    variables = layer.init(jax.random.key(0), z, ctx)
    variables = jax.tree_util.tree_map(
        lambda a: a + 0.03 * jax.random.normal(jax.random.key(1), a.shape),
        variables)
    out, _ = layer.apply(variables, z, ctx)
    z2 = layer.apply(variables, out, ctx, inverse=True)
    np.testing.assert_allclose(np.asarray(z2), np.asarray(z), atol=1e-3)


def test_film_stack_masking(rng):
    z, ctx, lens = batch(rng, C=4)
    stack = FiLMStack(n_hidden_channels=8, n_out_channels=6, n_layers=2,
                      use_bn=True)
    variables = stack.init(jax.random.key(0), z[..., :4], ctx, lens.mask)
    out, _ = stack.apply(variables, z[..., :4], ctx, lens.mask, True,
                         mutable=["batch_stats"])
    assert out.shape == (2, 12, 6)
    np.testing.assert_allclose(np.asarray(out), 0.0)  # zero-init head


def test_scaling_fns():
    u = jnp.asarray(np.linspace(-2, 2, 5, dtype=np.float32))
    for fn in ["translate", "exp", "tanh", "sigmoid"]:
        s, log_s = scaling_and_logs(u, fn)
        np.testing.assert_allclose(np.asarray(jnp.log(s)), np.asarray(log_s),
                                   atol=1e-6)
        assert (np.asarray(s) > 0).all()
    # per-channel list variant
    u2 = jnp.stack([u, u], axis=-1)
    s, log_s = scaling_and_logs(u2, ["exp", "tanh"])
    np.testing.assert_allclose(np.asarray(s[..., 0]), np.exp(np.asarray(u)),
                               rtol=1e-5)


def test_simple_convnet_channel_doubling(rng):
    z, ctx, lens = batch(rng, C=8)
    net = SimpleConvNet(final_out_channels=10, n_layers=3)
    variables = net.init(jax.random.key(0), z, lens.mask)
    out = net.apply(variables, z, lens.mask)
    assert out.shape == (2, 12, 10)
