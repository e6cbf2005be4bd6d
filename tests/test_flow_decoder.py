"""Flow decoder: squeeze layout, end-to-end invertibility, whitening init."""
import jax
import jax.numpy as jnp
import numpy as np

from radmmm_tpu.models.flow_decoder import (
    RADMMMFlow, squeeze_time, unsqueeze_time, init_whitening_from_batch)
from radmmm_tpu.utils.masking import SeqLens


def tiny_flow(**kw):
    args = dict(n_speaker_dim=4, use_accent=True, n_accent_dim=2,
                n_text_dim=12, n_group_size=2, n_mel_channels=8,
                n_f0_dims=1, n_energy_avg_dims=1, use_context_lstm=True,
                n_flows=4, n_conv_layers_per_step=1, n_early_size=2,
                n_early_every=2, affine_model="wavenet", scaling_fn="tanh",
                use_partial_padding=True)
    args.update(kw)
    return RADMMMFlow(**args)


def tiny_batch(rng, B=2, T=12):
    mel = jnp.asarray(rng.standard_normal((B, T, 8)).astype(np.float32))
    spk = jnp.asarray(rng.standard_normal((B, 4)).astype(np.float32))
    ctx = jnp.asarray(rng.standard_normal((B, T, 12)).astype(np.float32))
    f0 = jnp.asarray(rng.uniform(0, 1, (B, T)).astype(np.float32))
    energy = jnp.asarray(rng.uniform(0, 1, (B, T)).astype(np.float32))
    acc = jnp.asarray(rng.standard_normal((B, 2)).astype(np.float32))
    lens_np = np.maximum(T - 4 * np.arange(B), 4).astype(np.int32)
    lens_np[0] = T
    lens = SeqLens.create(jnp.asarray(lens_np), T)
    return mel, spk, ctx, f0, energy, acc, lens


def test_squeeze_matches_unfold_ordering(rng):
    """(B,T,C) squeeze must equal torch nn.Unfold channel-major layout."""
    import torch
    x = rng.standard_normal((1, 6, 3)).astype(np.float32)
    got = np.asarray(squeeze_time(jnp.asarray(x), 2))   # (1, 3, 6)
    xt = torch.from_numpy(x.transpose(0, 2, 1))         # (1, C, T)
    unfold = torch.nn.Unfold(kernel_size=(2, 1), stride=2)
    want = unfold(xt.unsqueeze(-1)).numpy()             # (1, C*2, T//2)
    np.testing.assert_allclose(got, want.transpose(0, 2, 1))
    back = np.asarray(unsqueeze_time(jnp.asarray(got), 2))
    np.testing.assert_allclose(back, x)


def test_flow_forward_shapes_and_invertibility(rng):
    flow = tiny_flow()
    mel, spk, ctx, f0, energy, acc, lens = tiny_batch(rng)
    variables = flow.init(jax.random.key(0), mel, spk, ctx, lens, f0,
                          energy, acc)
    out = flow.apply(variables, mel, spk, ctx, lens, f0, energy, acc,
                     train=False)
    z = out["z_mel"]
    assert z.shape == (2, 6, 16)          # T//2 frames, 8*2 channels
    assert len(out["log_s_list"]) == 4
    assert len(out["log_det_W_list"]) == 4

    # analysis-synthesis: push z back through infer with dur=1 per frame
    dur = jnp.ones((2, 12), jnp.int32) * lens.fmask(jnp.int32)
    rec = flow.apply(
        variables, jax.random.key(1), spk, ctx, 1.0, dur, f0, energy,
        lens, acc, residual=z, method=flow.infer)
    got = np.asarray(rec["mel"])
    want = np.asarray(mel) * np.asarray(lens.fmask())[..., None]
    # compare within valid (grouped) frames
    np.testing.assert_allclose(got[0, :12], want[0, :12], atol=1e-3)
    np.testing.assert_allclose(got[1, :8], want[1, :8], atol=1e-3)


def test_whitening_init_from_batch(rng):
    flow = tiny_flow()
    mel, spk, ctx, f0, energy, acc, lens = tiny_batch(rng, B=4, T=20)
    variables = flow.init(jax.random.key(0), mel, spk, ctx, lens, f0,
                          energy, acc)
    new_vars = init_whitening_from_batch(variables, flow, mel, spk, ctx,
                                         lens, f0, energy, acc)
    assert bool(new_vars["buffers"]["flow_0"]["invtbl_conv"]["initialized"])
    # step-0 whitening now whitens the squeezed mel: check first flow input
    z = squeeze_time(mel, 2)
    glens = lens.downsample(2)
    wc = new_vars["params"]["flow_0"]["invtbl_conv"]
    W = np.triu(np.asarray(wc["upper"]), 1) + np.diag(
        np.asarray(wc["upper_diag"]))
    mean = np.asarray(
        new_vars["buffers"]["flow_0"]["invtbl_conv"]["input_mean"])
    zn = np.asarray(z)
    m = np.asarray(glens.fmask())
    y = (zn - mean) @ W.T
    n = m.sum()
    mu = np.einsum("btc,bt->c", y, m) / n
    cov = np.einsum("btc,btd,bt->cd", y, y, m) / n - np.outer(mu, mu)
    np.testing.assert_allclose(cov, np.eye(16), atol=2e-2)


def test_flow_logdet_consistency(rng):
    """Total logdet from the model == autodiff logdet of mel->z (one item)."""
    flow = tiny_flow(n_flows=2, n_early_every=4, use_context_lstm=False,
                     n_group_size=1)
    B, T = 1, 4
    mel = jnp.asarray(rng.standard_normal((B, T, 8)).astype(np.float32))
    spk = jnp.asarray(rng.standard_normal((B, 4)).astype(np.float32))
    ctx = jnp.asarray(rng.standard_normal((B, T, 12)).astype(np.float32))
    f0 = jnp.asarray(rng.uniform(0, 1, (B, T)).astype(np.float32))
    energy = jnp.asarray(rng.uniform(0, 1, (B, T)).astype(np.float32))
    acc = jnp.asarray(rng.standard_normal((B, 2)).astype(np.float32))
    lens = SeqLens.create(jnp.asarray([T]), T)
    variables = flow.init(jax.random.key(0), mel, spk, ctx, lens, f0,
                          energy, acc)

    def fwd(m_flat):
        out = flow.apply(variables, m_flat.reshape(B, T, 8), spk, ctx, lens,
                         f0, energy, acc, train=False)
        return out["z_mel"].reshape(-1)

    J = np.asarray(jax.jacfwd(fwd)(mel.reshape(-1)))
    want = np.linalg.slogdet(J)[1]
    out = flow.apply(variables, mel, spk, ctx, lens, f0, energy, acc,
                     train=False)
    got = float(sum(np.asarray(ls).sum() for ls in out["log_s_list"])
                + sum(float(d) * T for d in out["log_det_W_list"]))
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-3)


def test_flow_with_spline_steps(rng):
    """n_splines>0: first steps use quadratic spline couplings
    (decoders.py:51-61); forward must stay invertible end-to-end."""
    flow = tiny_flow(n_splines=1, use_bn=False)
    mel, spk, ctx, f0, energy, acc, lens = tiny_batch(rng)
    mel = jnp.clip(mel, -2.0, 2.0)
    variables = flow.init(jax.random.key(0), mel, spk, ctx, lens, f0,
                          energy, acc)
    out = flow.apply(variables, mel, spk, ctx, lens, f0, energy, acc,
                     train=False)
    assert np.isfinite(np.asarray(out["z_mel"])).all()
    dur = jnp.ones((2, 12), jnp.int32) * lens.fmask(jnp.int32)
    rec = flow.apply(variables, jax.random.key(1), spk, ctx, 1.0, dur, f0,
                     energy, lens, acc, residual=out["z_mel"],
                     method=flow.infer)
    got = np.asarray(rec["mel"])
    want = np.asarray(mel) * np.asarray(lens.fmask())[..., None]
    np.testing.assert_allclose(got[0, :12], want[0, :12], atol=5e-3)


import pytest


@pytest.mark.parametrize("remat_mode", [True, "save_wn"])
def test_remat_matches_plain(rng, remat_mode):
    """remat=True and the 'save_wn' selective policy are numerically
    identical (outputs and grads) to the plain decoder — they only change
    what the backward pass rematerializes."""
    mel, spk, ctx, f0, energy, acc, lens = tiny_batch(rng)
    plain = tiny_flow()
    rem = tiny_flow(remat=remat_mode)
    variables = plain.init({"params": jax.random.key(0)}, mel, spk, ctx,
                           lens, f0=f0, energy_avg=energy, accent_vecs=acc,
                           train=False)

    rest = {k: v for k, v in variables.items() if k != "params"}

    def loss(model, params):
        out = model.apply({"params": params, **rest}, mel, spk, ctx, lens,
                          f0=f0, energy_avg=energy, accent_vecs=acc,
                          train=False)
        return (jnp.sum(out["z_mel"] ** 2)
                + sum(jnp.sum(s) for s in out["log_s_list"])), out

    (l0, out0), g0 = jax.value_and_grad(
        lambda p: loss(plain, p), has_aux=True)(variables["params"])
    (l1, out1), g1 = jax.value_and_grad(
        lambda p: loss(rem, p), has_aux=True)(variables["params"])
    np.testing.assert_allclose(float(l0), float(l1), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(out0["z_mel"]),
                               np.asarray(out1["z_mel"]), atol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(g0),
                    jax.tree_util.tree_leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)

    # inference (inverse) path also runs under the remat-wrapped steps
    inf0 = plain.apply(variables, jax.random.key(1), spk,
                       ctx[:, ::2][:, :6], 0.7,
                       dur=jnp.full((2, 6), 2, jnp.int32), f0=f0,
                       energy_avg=energy, lens=lens, accent_vecs=acc,
                       method=RADMMMFlow.infer)
    inf1 = rem.apply(variables, jax.random.key(1), spk,
                     ctx[:, ::2][:, :6], 0.7,
                     dur=jnp.full((2, 6), 2, jnp.int32), f0=f0,
                     energy_avg=energy, lens=lens, accent_vecs=acc,
                     method=RADMMMFlow.infer)
    np.testing.assert_allclose(np.asarray(inf0["mel"]),
                               np.asarray(inf1["mel"]), atol=1e-6)
