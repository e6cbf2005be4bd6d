"""Parity of masked conv / norms vs torch oracles on variable-length batches."""
import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from radmmm_tpu.ops.conv import MaskedConv1d, Linear
from radmmm_tpu.ops.norms import MaskedInstanceNorm1d, MaskedBatchNorm
from radmmm_tpu.utils.masking import SeqLens


def make_batch(rng, B=3, T=17, C=8):
    x = rng.standard_normal((B, T, C)).astype(np.float32)
    lens = np.array([T, T - 5, T - 9], dtype=np.int32)[:B]
    sl = SeqLens.create(jnp.asarray(lens), T)
    return x, lens, sl


def test_masked_conv_equals_per_item_torch_conv(rng):
    """Batched masked conv == looping truncated items through torch Conv1d."""
    x, lens, sl = make_batch(rng)
    mod = MaskedConv1d(features=6, kernel_size=5, dilation=2)
    params = mod.init(jax.random.key(0), jnp.asarray(x), sl.mask)
    got = np.asarray(mod.apply(params, jnp.asarray(x), sl.mask))

    kernel = np.asarray(params["params"]["kernel"])  # (K, Cin, Cout)
    bias = np.asarray(params["params"]["bias"])
    w = torch.from_numpy(kernel.transpose(2, 1, 0))  # (Cout, Cin, K)
    b = torch.from_numpy(bias)
    for i, L in enumerate(lens):
        xi = torch.from_numpy(x[i:i + 1, :L].transpose(0, 2, 1))
        yi = F.conv1d(xi, w, b, padding=4, dilation=2).numpy()[0].T  # (L, Cout)
        np.testing.assert_allclose(got[i, :L], yi, atol=1e-5)
    assert np.abs(got[1, lens[1]:]).max() == 0


def test_partial_conv_matches_reference_formula(rng):
    """Partial padding renormalization == reference formula (torch oracle)."""
    x, lens, sl = make_batch(rng)
    mod = MaskedConv1d(features=6, kernel_size=5, use_partial_padding=True)
    params = mod.init(jax.random.key(1), jnp.asarray(x), sl.mask)
    got = np.asarray(mod.apply(params, jnp.asarray(x), sl.mask))

    kernel = np.asarray(params["params"]["kernel"])
    bias = np.asarray(params["params"]["bias"])
    w = torch.from_numpy(kernel.transpose(2, 1, 0))
    b = torch.from_numpy(bias)
    mask = torch.from_numpy(
        (np.arange(x.shape[1])[None] < lens[:, None]).astype(np.float32))[:, None]
    xt = torch.from_numpy(x.transpose(0, 2, 1)) * mask
    raw = F.conv1d(xt, w, b, padding=2)
    ones = torch.ones(1, 1, 5)
    update = F.conv1d(mask, ones, padding=2)
    ratio = 5.0 / (update + 1e-6)
    update_c = update.clamp(0, 1)
    ratio = ratio * update_c
    want = ((raw - b.view(1, -1, 1)) * ratio + b.view(1, -1, 1)) * update_c
    want = (want * mask).numpy().transpose(0, 2, 1)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_weight_norm_reconstruction(rng):
    """kernel == g * v/||v|| per output channel, matching torch weight_norm."""
    x, lens, sl = make_batch(rng)
    mod = MaskedConv1d(features=6, kernel_size=3, use_weight_norm=True)
    params = mod.init(jax.random.key(2), jnp.asarray(x), sl.mask)
    v = np.asarray(params["params"]["v"])
    g = np.asarray(params["params"]["g"])
    # at init g == ||v|| so effective kernel == v
    norm = np.linalg.norm(v.transpose(2, 0, 1).reshape(6, -1), axis=1)
    np.testing.assert_allclose(g, norm, rtol=1e-6)

    vt = torch.nn.utils.weight_norm(torch.nn.Conv1d(8, 6, 3, padding=1))
    with torch.no_grad():
        vt.weight_v.copy_(torch.from_numpy(v.transpose(2, 1, 0)))
        vt.weight_g.copy_(torch.from_numpy(g).view(6, 1, 1) * 2.0)
    # scale g by 2 in ours too, then compare full forward
    params = jax.tree_util.tree_map(lambda a: a, params)
    params["params"]["g"] = jnp.asarray(g * 2.0)
    got = np.asarray(mod.apply(params, jnp.asarray(x), sl.mask))
    with torch.no_grad():
        vt.bias.zero_()
    m = (np.arange(x.shape[1])[None] < lens[:, None]).astype(np.float32)
    xm = x * m[..., None]  # module zeroes masked input before the conv
    want = vt(torch.from_numpy(xm.transpose(0, 2, 1))).detach().numpy()
    want = want.transpose(0, 2, 1)
    np.testing.assert_allclose(got, want * m[..., None], atol=1e-5)


def test_masked_instance_norm_vs_torch(rng):
    x, lens, sl = make_batch(rng)
    mod = MaskedInstanceNorm1d(features=8)
    params = mod.init(jax.random.key(3), jnp.asarray(x), sl.mask)
    got = np.asarray(mod.apply(params, jnp.asarray(x), sl.mask))
    inorm = torch.nn.InstanceNorm1d(8, affine=True)
    with torch.no_grad():
        inorm.weight.fill_(1.0)
        inorm.bias.zero_()
    for i, L in enumerate(lens):
        xi = torch.from_numpy(x[i:i + 1, :L].transpose(0, 2, 1))
        want = inorm(xi).detach().numpy()[0].T
        np.testing.assert_allclose(got[i, :L], want, atol=1e-4)


def test_masked_batch_norm_train_and_eval(rng):
    x, lens, sl = make_batch(rng)
    mod = MaskedBatchNorm(features=8)
    variables = mod.init(jax.random.key(4), jnp.asarray(x), sl.mask, train=True)
    out, mutated = mod.apply(variables, jnp.asarray(x), sl.mask, train=True,
                             mutable=["batch_stats"])
    out = np.asarray(out)
    m = (np.arange(x.shape[1])[None] < lens[:, None]).astype(np.float32)
    n = m.sum()
    mean = (x * m[..., None]).sum((0, 1)) / n
    var = (x ** 2 * m[..., None]).sum((0, 1)) / n - mean ** 2
    want = (x - mean) / np.sqrt(var + 1e-5)
    np.testing.assert_allclose(out, want, atol=1e-4)
    # running stats: momentum 0.1, unbiased var
    rm = np.asarray(mutated["batch_stats"]["mean"])
    rv = np.asarray(mutated["batch_stats"]["var"])
    np.testing.assert_allclose(rm, 0.1 * mean, atol=1e-5)
    np.testing.assert_allclose(rv, 0.1 * var * n / (n - 1) + 0.9, atol=1e-4)
    # eval mode uses running stats
    variables = {"params": variables.get("params", {}), "batch_stats": mutated["batch_stats"]}
    out_eval = np.asarray(mod.apply(variables, jnp.asarray(x), sl.mask, train=False))
    want_eval = (x - rm) / np.sqrt(rv + 1e-5)
    np.testing.assert_allclose(out_eval, want_eval, atol=1e-4)


def test_linear_matches_torch(rng):
    x = rng.standard_normal((4, 8)).astype(np.float32)
    mod = Linear(features=5)
    params = mod.init(jax.random.key(5), jnp.asarray(x))
    got = np.asarray(mod.apply(params, jnp.asarray(x)))
    k = np.asarray(params["params"]["kernel"])
    b = np.asarray(params["params"]["bias"])
    np.testing.assert_allclose(got, x @ k + b, atol=1e-5)
