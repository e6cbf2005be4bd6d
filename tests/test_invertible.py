"""Invertible 1x1 layers: orthonormal init, round trips, logdet, whitening."""
import jax
import jax.numpy as jnp
import numpy as np

from radmmm_tpu.ops.invertible import (
    InvertibleLU, WhiteningConv, InvertibleConv,
    whitening_stats, whitening_params_from_stats)
from radmmm_tpu.utils.masking import SeqLens


def test_lu_init_is_orthonormal():
    mod = InvertibleLU(channels=12, init_seed=3)
    x = jnp.zeros((1, 4, 12))
    variables = mod.init(jax.random.key(0), x)
    W = np.asarray(mod.apply(variables, method=mod.weight))
    np.testing.assert_allclose(W @ W.T, np.eye(12), atol=1e-5)
    assert np.linalg.det(W) > 0


def test_lu_roundtrip_and_logdet(rng):
    mod = InvertibleLU(channels=10, init_seed=1)
    x = jnp.asarray(rng.standard_normal((2, 7, 10)).astype(np.float32))
    variables = mod.init(jax.random.key(0), x)
    # perturb params (not the permutation buffer) so W isn't orthonormal
    variables = {
        "params": jax.tree_util.tree_map(
            lambda a: a + 0.01 * np.float32(1.0), variables["params"]),
        "buffers": variables["buffers"],
    }
    y, logdet = mod.apply(variables, x)
    x2 = mod.apply(variables, y, inverse=True)
    np.testing.assert_allclose(np.asarray(x2), np.asarray(x), atol=1e-4)
    W = np.asarray(mod.apply(variables, method=mod.weight))
    np.testing.assert_allclose(float(logdet),
                               np.linalg.slogdet(W)[1], atol=1e-4)


def test_whitening_init_whitens(rng):
    B, T, C = 4, 50, 6
    # correlated data with nontrivial mean
    A = rng.standard_normal((C, C)).astype(np.float32)
    z = rng.standard_normal((B, T, C)).astype(np.float32)
    data = jnp.asarray(z @ A.T + np.arange(C, dtype=np.float32))
    lens = SeqLens.create(jnp.asarray(np.array([50, 40, 30, 20])), T)

    mean, covar = whitening_stats(data, lens.mask)
    new = whitening_params_from_stats(mean, covar)

    mod = WhiteningConv(channels=C)
    variables = mod.init(jax.random.key(0), data)
    variables = {
        "params": {"upper": new["upper"], "upper_diag": new["upper_diag"]},
        "buffers": {"input_mean": new["input_mean"],
                    "initialized": jnp.ones((), jnp.bool_)},
    }
    y, logdet = mod.apply(variables, data)
    # whitened output must have ~identity covariance over valid frames
    m = np.asarray(lens.fmask())
    yn = np.asarray(y)
    n = m.sum()
    mu = np.einsum("btc,bt->c", yn, m) / n
    cov = np.einsum("btc,btd,bt->cd", yn, yn, m) / n - np.outer(mu, mu)
    np.testing.assert_allclose(mu, 0.0, atol=1e-3)
    np.testing.assert_allclose(cov, np.eye(C), atol=5e-3)
    # roundtrip
    x2 = mod.apply(variables, y, inverse=True)
    np.testing.assert_allclose(np.asarray(x2), np.asarray(data), atol=1e-3)


def test_whitening_stats_psum_equals_global(rng):
    """Sharded psum stats == single-host stats (the dist.broadcast parity)."""
    B, T, C = 8, 10, 4
    data = rng.standard_normal((B, T, C)).astype(np.float32)
    mask = np.ones((B, T), np.float32)
    mean_g, cov_g = whitening_stats(jnp.asarray(data), jnp.asarray(mask))

    devs = jax.devices()
    assert len(devs) == 8
    mesh = jax.sharding.Mesh(np.array(devs), ("data",))

    @jax.jit
    @jax.shard_map(mesh=mesh,
                   in_specs=jax.sharding.PartitionSpec("data"),
                   out_specs=jax.sharding.PartitionSpec())
    def sharded_stats(d):
        m = jnp.ones(d.shape[:2], d.dtype)
        mean, cov = whitening_stats(d, m, axis_name="data")
        return jnp.concatenate([mean[None], cov], axis=0)

    out = np.asarray(sharded_stats(jnp.asarray(data)))
    np.testing.assert_allclose(out[0], np.asarray(mean_g), atol=1e-5)
    np.testing.assert_allclose(out[1:], np.asarray(cov_g), atol=1e-5)


def test_plain_invertible_conv(rng):
    mod = InvertibleConv(channels=8)
    x = jnp.asarray(rng.standard_normal((1, 5, 8)).astype(np.float32))
    variables = mod.init(jax.random.key(0), x)
    y, logdet = mod.apply(variables, x)
    x2 = mod.apply(variables, y, inverse=True)
    np.testing.assert_allclose(np.asarray(x2), np.asarray(x), atol=1e-4)
    # orthonormal init -> logdet ~ 0
    np.testing.assert_allclose(float(logdet), 0.0, atol=1e-4)
