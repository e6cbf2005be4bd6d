"""Direct numerical parity vs the ACTUAL reference implementation.

These tests import modules from the upstream repo (mounted read-only at
/root/reference) and compare our ops against them with copied weights —
the strongest parity evidence available. Skipped when the reference (or its
torch-only deps) is absent. Only torch-pure modules are used (numba/librosa/
unidecode are unavailable, so alignment/dataloading/cleaner modules can't
be imported — those are covered by re-derived oracles elsewhere).
"""
import os
import sys

import numpy as np
import pytest

REF = "/root/reference"
pytestmark = pytest.mark.skipif(not os.path.isdir(REF),
                                reason="reference repo not mounted")

if os.path.isdir(REF) and REF not in sys.path:
    sys.path.insert(0, REF)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import torch  # noqa: E402


# ---------------------------------------------------------------------------
# splines
# ---------------------------------------------------------------------------
def test_piecewise_linear_matches_reference(rng):
    import splines as ref_splines
    from radmmm_tpu.ops import splines as ours
    x = rng.uniform(0.05, 0.95, (8, 5)).astype(np.float32)
    q = rng.standard_normal((8, 5, 8)).astype(np.float32)
    y_ref, logj_ref = ref_splines.piecewise_linear_transform(
        torch.from_numpy(x), torch.from_numpy(q))
    y, logj = ours.piecewise_linear_transform(jnp.asarray(x), jnp.asarray(q))
    np.testing.assert_allclose(np.asarray(y), y_ref.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(logj), logj_ref.numpy(), atol=1e-5)

    x2_ref, logj2_ref = ref_splines.piecewise_linear_inverse_transform(
        y_ref, torch.from_numpy(q))
    x2, logj2 = ours.piecewise_linear_inverse_transform(y, jnp.asarray(q))
    np.testing.assert_allclose(np.asarray(x2), x2_ref.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(logj2), logj2_ref.numpy(),
                               atol=1e-5)


def test_quadratic_spline_matches_reference(rng):
    import splines as ref_splines
    from radmmm_tpu.ops import splines as ours
    x = rng.uniform(-2.5, 2.5, (64,)).astype(np.float32)
    w_t = rng.standard_normal((64, 16)).astype(np.float32)
    v_t = rng.standard_normal((64, 17)).astype(np.float32)
    # normalized domain as the coupling layer uses it: [0,1)
    xn = (x + 3.0) / 6.0
    y_ref, logj_ref = ref_splines.unbounded_piecewise_quadratic_transform(
        torch.from_numpy(xn), torch.from_numpy(w_t), torch.from_numpy(v_t))
    y, logj = ours.unbounded_piecewise_quadratic_transform(
        jnp.asarray(xn), jnp.asarray(w_t), jnp.asarray(v_t))
    np.testing.assert_allclose(np.asarray(y), y_ref.numpy(), atol=2e-5)
    np.testing.assert_allclose(np.asarray(logj), logj_ref.numpy(), atol=2e-5)
    # inverse
    x_ref, _ = ref_splines.unbounded_piecewise_quadratic_transform(
        y_ref, torch.from_numpy(w_t), torch.from_numpy(v_t), inverse=True)
    x_inv, _ = ours.unbounded_piecewise_quadratic_transform(
        y, jnp.asarray(w_t), jnp.asarray(v_t), inverse=True)
    np.testing.assert_allclose(np.asarray(x_inv), x_ref.numpy(), atol=2e-5)


# ---------------------------------------------------------------------------
# RAdam
# ---------------------------------------------------------------------------
def test_radam_matches_reference_optimizer(rng):
    from radam import RAdam as RefRAdam
    from radmmm_tpu.training.optim import radam_exact
    import optax

    p_ref = torch.nn.Parameter(
        torch.from_numpy(rng.standard_normal(7).astype(np.float32)))
    p0 = p_ref.detach().numpy().copy()
    opt_ref = RefRAdam([p_ref], lr=0.01, weight_decay=0.001)

    tx = radam_exact(0.01, weight_decay=0.001)
    p = jnp.asarray(p0)
    opt_state = tx.init(p)
    for t in range(15):
        g = rng.standard_normal(7).astype(np.float32)
        opt_ref.zero_grad()
        p_ref.grad = torch.from_numpy(g.copy())
        opt_ref.step()
        upd, opt_state = tx.update(jnp.asarray(g), opt_state, p)
        p = optax.apply_updates(p, upd)
        np.testing.assert_allclose(np.asarray(p), p_ref.detach().numpy(),
                                   atol=1e-5, err_msg=f"step {t}")


# ---------------------------------------------------------------------------
# partial conv + masked batch norm
# ---------------------------------------------------------------------------
def test_partial_conv_matches_reference(rng):
    from partialconv1d import PartialConv1d as RefPConv
    from radmmm_tpu.ops.conv import MaskedConv1d
    from radmmm_tpu.utils.masking import SeqLens

    B, T, C, O, K = 3, 15, 6, 5, 5
    x = rng.standard_normal((B, T, C)).astype(np.float32)
    lens = np.array([15, 11, 6], np.int32)
    sl = SeqLens.create(jnp.asarray(lens), T)

    mod = MaskedConv1d(features=O, kernel_size=K, use_partial_padding=True)
    params = mod.init(jax.random.key(0), jnp.asarray(x), sl.mask)
    got = np.asarray(mod.apply(params, jnp.asarray(x), sl.mask))

    ref = RefPConv(C, O, kernel_size=K, padding=K // 2)
    with torch.no_grad():
        ref.weight.copy_(torch.from_numpy(
            np.asarray(params["params"]["kernel"]).transpose(2, 1, 0)))
        ref.bias.copy_(torch.from_numpy(np.asarray(
            params["params"]["bias"])))
    mask_t = torch.from_numpy(
        (np.arange(T)[None, None] < lens[:, None, None]).astype(np.float32))
    xt = torch.from_numpy(x.transpose(0, 2, 1)) * mask_t
    with torch.no_grad():
        want = ref(xt, mask_t).numpy().transpose(0, 2, 1)
    # our module re-zeroes the padded region (ConvNorm does it after pconv)
    want = want * np.asarray(sl.fmask())[..., None]
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_masked_batch_norm_matches_reference(rng):
    from maskedbatchnorm1d import MaskedBatchNorm1d as RefBN
    from radmmm_tpu.ops.norms import MaskedBatchNorm
    from radmmm_tpu.utils.masking import SeqLens

    B, T, C = 3, 12, 5
    x = rng.standard_normal((B, T, C)).astype(np.float32)
    lens = np.array([12, 8, 5], np.int32)
    sl = SeqLens.create(jnp.asarray(lens), T)

    ours = MaskedBatchNorm(features=C)
    variables = ours.init(jax.random.key(0), jnp.asarray(x), sl.mask,
                          train=True)
    got, mut = ours.apply(variables, jnp.asarray(x), sl.mask, train=True,
                          mutable=["batch_stats"])

    ref = RefBN(C)
    ref.train()
    mask_t = torch.from_numpy(
        (np.arange(T)[None, None] < lens[:, None, None]).astype(np.float32))
    with torch.no_grad():
        want = ref(torch.from_numpy(x.transpose(0, 2, 1)), mask_t)
    np.testing.assert_allclose(np.asarray(got),
                               want.numpy().transpose(0, 2, 1), atol=1e-5)
    np.testing.assert_allclose(np.asarray(mut["batch_stats"]["mean"]),
                               ref.running_mean.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(mut["batch_stats"]["var"]),
                               ref.running_var.numpy(), atol=1e-4)


# ---------------------------------------------------------------------------
# WN coupling parameter predictor with copied weights
# ---------------------------------------------------------------------------
def _copy_wn_conv(ref_conv, ours, name, weight_normed=True):
    """torch Conv1d (possibly weight-normed) -> our param dict entries."""
    if weight_normed:
        v = ref_conv.weight_v.detach().numpy()       # (O, I, K)
        g = ref_conv.weight_g.detach().numpy().reshape(-1)
        ours[name] = {"v": v.transpose(2, 1, 0), "g": g,
                      "bias": ref_conv.bias.detach().numpy()}
    else:
        w = ref_conv.weight.detach().numpy()
        ours[name] = {"kernel": w.transpose(2, 1, 0),
                      "bias": ref_conv.bias.detach().numpy()}


def test_wn_matches_reference(rng):
    import common as ref_common
    from radmmm_tpu.ops.coupling import WN
    from radmmm_tpu.utils.masking import SeqLens

    n_half, n_ctx, n_layers, n_ch = 4, 6, 2, 16
    torch.manual_seed(0)
    ref = ref_common.WN(n_half, n_ctx, n_layers, n_ch, kernel_size=5,
                        affine_activation="softplus",
                        use_partial_padding=True)
    ref.eval()

    B, T = 2, 11
    z = rng.standard_normal((B, T, n_half)).astype(np.float32)
    ctx = rng.standard_normal((B, T, n_ctx)).astype(np.float32)
    lens = np.array([11, 7], np.int32)

    params = {}
    _copy_wn_conv(ref.start, params, "start")
    for i in range(n_layers):
        _copy_wn_conv(ref.in_layers[i].conv, params, f"in_{i}")
        _copy_wn_conv(ref.res_skip_layers[i], params, f"res_skip_{i}")
    params["end"] = {
        "kernel": ref.end.weight.detach().numpy().transpose(2, 1, 0),
        "bias": ref.end.bias.detach().numpy()}

    sl = SeqLens.create(jnp.asarray(lens), T)
    wn = WN(n_in_channels=n_half, n_layers=n_layers, n_channels=n_ch,
            kernel_size=5)
    got = np.asarray(wn.apply({"params": params}, jnp.asarray(z),
                              jnp.asarray(ctx), sl.mask))

    seq = ref_common.SequenceLength(torch.from_numpy(lens.astype(np.int64)))
    with torch.no_grad():
        want = ref((torch.from_numpy(z.transpose(0, 2, 1)),
                    torch.from_numpy(ctx.transpose(0, 2, 1))),
                   seq_lens=seq).numpy().transpose(0, 2, 1)
    # compare within valid frames (we re-zero padding, reference leaves
    # whatever the partial convs produce there)
    for b, L in enumerate(lens):
        np.testing.assert_allclose(got[b, :L], want[b, :L], atol=2e-4)


def test_invertible_lus_matches_reference(rng):
    import common as ref_common
    from radmmm_tpu.ops.invertible import InvertibleLU

    c = 10
    torch.manual_seed(3)
    ref = ref_common.Invertible1x1ConvLUS(c)
    z = rng.standard_normal((2, 7, c)).astype(np.float32)

    ours = InvertibleLU(channels=c)
    variables = ours.init(jax.random.key(0), jnp.asarray(z))
    variables = {
        "params": {
            "lower": ref.lower.detach().numpy(),
            "upper": ref.upper.detach().numpy(),
            "upper_diag": ref.upper_diag.detach().numpy(),
        },
        "buffers": {"p": ref.p.numpy()},
    }
    got, logdet = ours.apply(variables, jnp.asarray(z))
    with torch.no_grad():
        want, logdet_ref = ref(torch.from_numpy(z.transpose(0, 2, 1)))
    np.testing.assert_allclose(np.asarray(got),
                               want.numpy().transpose(0, 2, 1), atol=1e-5)
    np.testing.assert_allclose(float(logdet), float(logdet_ref), atol=1e-5)


# ---------------------------------------------------------------------------
# symbol inventory
# ---------------------------------------------------------------------------
@pytest.mark.parametrize("name", ["english_basic", "radtts",
                                  "radmmm_phonemizer_marker_segregated"])
def test_symbol_sets_match_reference(name):
    sys.path.insert(0, os.path.join(REF, "tts_text_processing"))
    try:
        import importlib
        import symbols as ref_symbols
        importlib.reload(ref_symbols)
        ref_syms, ref_markers, ref_ph, ref_dip = ref_symbols.get_symbols(name)
    finally:
        sys.path.pop(0)
    from radmmm_tpu.text.symbols import get_symbols
    syms, markers, ph, dip = get_symbols(name)
    assert set(syms) == set(ref_syms), (
        f"{name}: missing={sorted(set(ref_syms)-set(syms))[:10]} "
        f"extra={sorted(set(syms)-set(ref_syms))[:10]}")
    assert syms == sorted(set(syms)) or name in ("english_basic", "radtts")
    if ref_ph is not None:
        assert {k: sorted(set(v)) for k, v in ph.items()} == \
            {k: sorted(set(v)) for k, v in ref_ph.items()}
        assert sorted(set(dip)) == sorted(set(ref_dip))
