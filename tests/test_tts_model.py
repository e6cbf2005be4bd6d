"""Full TTSModel: forward outputs, losses aggregate, sampling runs."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from radmmm_tpu.models.tts import TTSModel, TTSConfig
from radmmm_tpu.losses.flow import (RADMMMLoss, AttributeRegressionLoss,
                                    AttributeBCELoss)
from radmmm_tpu.losses.regularizers import (
    VarianceCovarianceEmbeddingRegLoss, AttributeMinCrossCovarianceRegLoss)
from radmmm_tpu.utils.masking import SeqLens


def tiny_config(**kw):
    dap = dict(n_speaker_dim=4, n_accent_dim=2, use_accent_embedding=True,
               in_dim=18, out_dim=1, reduction_factor=2,
               n_backbone_layers=1, n_hidden=8, kernel_size=3,
               p_dropout=0.25, lstm_type="bilstm")
    cfg = dict(
        n_text_tokens=30, n_text_dim=16, n_speakers=3, n_speaker_dim=4,
        n_augmentations=0, use_accent=True, n_accents=2, n_accent_dim=2,
        n_mel_channels=8, use_accent_emb_for_encoder=True,
        use_speaker_emb_for_alignment=True, lstm_norm_fn="spectral",
        decoder=dict(n_speaker_dim=4, use_accent=True, n_accent_dim=2,
                     n_text_dim=18, use_context_lstm=True, n_f0_dims=1,
                     n_energy_avg_dims=1, n_mel_channels=8, n_flows=2,
                     n_conv_layers_per_step=1, n_early_size=2,
                     n_early_every=2, n_group_size=2,
                     affine_model="wavenet", scaling_fn="tanh",
                     use_partial_padding=True),
        f0_predictor=dict(dap, target_offset=-5.0),
        energy_predictor=dict(dap, target_offset=-0.75),
        voiced_predictor=dict(dap),
        duration_predictor=dict(dap, log_target=True),
    )
    cfg.update(kw)
    return TTSConfig(**cfg)


def tiny_batch(rng, B=2, T_text=7, T_mel=16):
    prior = rng.uniform(0.1, 1.0, (B, T_mel, T_text)).astype(np.float32)
    prior /= prior.sum(-1, keepdims=True)
    return {
        "text": jnp.asarray(rng.integers(0, 30, (B, T_text)), jnp.int32),
        "input_lengths": jnp.asarray([T_text, T_text - 2], jnp.int32),
        "mel": jnp.asarray(rng.standard_normal((B, T_mel, 8)), jnp.float32),
        "output_lengths": jnp.asarray([T_mel, T_mel - 6], jnp.int32),
        "speaker_ids": jnp.asarray([0, 2], jnp.int32),
        "accent_ids": jnp.asarray([0, 1], jnp.int32),
        "f0": jnp.asarray(rng.uniform(4, 6, (B, T_mel)), jnp.float32),
        "voiced_mask": jnp.asarray(rng.integers(0, 2, (B, T_mel)),
                                   jnp.float32),
        "energy_avg": jnp.asarray(rng.uniform(0, 1, (B, T_mel)), jnp.float32),
        "attn_prior": jnp.asarray(prior),
        "speaker_f0_mean": jnp.asarray([5.0, 5.2], jnp.float32),
        "speaker_f0_std": jnp.asarray([0.3, 0.4], jnp.float32),
    }


@pytest.fixture(scope="module")
def model_and_vars():
    rng = np.random.default_rng(0)
    model = TTSModel(config=tiny_config())
    batch = tiny_batch(rng)
    variables = model.init(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)},
        batch, binarize=False, train=True)
    return model, variables, batch


def test_forward_shapes(model_and_vars):
    model, variables, batch = model_and_vars
    out, _ = model.apply(variables, batch, binarize=True, train=True,
                         mutable=["batch_stats", "spectral"],
                         rngs={"dropout": jax.random.key(2)})
    assert out["z_mel"].shape == (2, 8, 16)
    assert out["attn"].shape == (2, 16, 7)
    assert out["f0_outputs"]["x_hat"].shape == (2, 16, 1)
    assert out["duration_outputs"]["x_hat"].shape == (2, 7, 1)
    # hard attention is binary
    vals = np.unique(np.round(np.asarray(out["attn"]), 5))
    assert set(vals) <= {0.0, 1.0}


def test_losses_aggregate_and_are_finite(model_and_vars):
    model, variables, batch = model_and_vars
    out, _ = model.apply(variables, batch, binarize=True, train=True,
                         mutable=["batch_stats", "spectral"],
                         rngs={"dropout": jax.random.key(2)})
    in_lens = SeqLens.create(batch["input_lengths"], 7)
    out_lens = SeqLens.create(batch["output_lengths"], 16)

    loss_dict = RADMMMLoss(sigma=1.0, n_group_size=2)(
        out, in_lens, out_lens, binarization_on=True)
    loss_dict.update(AttributeRegressionLoss("f0_")(
        out["f0_outputs"], out_lens,
        mask=batch["voiced_mask"][..., None]))
    loss_dict.update(AttributeRegressionLoss("energy_")(
        out["energy_outputs"], out_lens))
    loss_dict.update(AttributeBCELoss("vpred_")(
        out["voiced_outputs"], out_lens))
    loss_dict.update(AttributeRegressionLoss("duration_")(
        out["duration_outputs"], None, mask=in_lens.mask[..., None]))
    emb = variables["params"]["speaker_embeddings"]["embedding"]
    loss_dict.update(VarianceCovarianceEmbeddingRegLoss("speaker", 1.0, 1.0)(emb))
    acc = variables["params"]["accent_embeddings"]["embedding"]
    loss_dict.update(AttributeMinCrossCovarianceRegLoss(
        "speaker", "accent", 1.0)(out["spk_vecs"], out["accent_vecs"],
                                  emb, acc))
    total = sum(v * w for v, w in loss_dict.values())
    assert np.isfinite(float(total))
    assert "loss_mel" in loss_dict and "loss_ctc" in loss_dict
    assert float(loss_dict["binarization_loss"][0]) > 0


def test_gradients_flow(model_and_vars):
    model, variables, batch = model_and_vars
    params = variables["params"]
    rest = {k: v for k, v in variables.items() if k != "params"}

    def loss_fn(p):
        out, _ = model.apply({"params": p, **rest}, batch, binarize=False,
                             train=True,
                             mutable=["batch_stats", "spectral"],
                             rngs={"dropout": jax.random.key(3)})
        in_lens = SeqLens.create(batch["input_lengths"], 7)
        out_lens = SeqLens.create(batch["output_lengths"], 16)
        ld = RADMMMLoss(sigma=1.0, n_group_size=2)(
            out, in_lens, out_lens, binarization_on=False)
        ld.update(AttributeRegressionLoss("f0_")(
            out["f0_outputs"], out_lens))
        return sum(v * w for v, w in ld.values())

    g = jax.grad(loss_fn)(params)
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
    # decoder gets gradient; predictors do NOT backprop into the encoder via
    # the detached context but f0 predictor's own params do get grads
    gnorm = float(sum(jnp.sum(l * l) for l in leaves))
    assert gnorm > 0


def test_infer_runs(model_and_vars):
    model, variables, batch = model_and_vars
    out = model.apply(
        variables, jax.random.key(9), batch["text"],
        batch["input_lengths"], batch["speaker_ids"],
        accent_ids=batch["accent_ids"],
        f0_mean=batch["speaker_f0_mean"], f0_std=batch["speaker_f0_std"],
        sigma=0.8, max_frames=64, method=TTSModel.infer)
    assert out["mel"].shape == (2, 64, 8)
    lens = np.asarray(out["lens"].lengths)
    assert (lens > 0).all() and (lens <= 64).all()
    # past each item's length the (descaled) mel is the constant
    # mel_descale(0) = -5, as in the reference's whole-tensor descale
    m = np.asarray(out["mel"])
    np.testing.assert_allclose(m[0, lens[0]:], -5.0)


def test_reconstruct_runs(model_and_vars):
    model, variables, batch = model_and_vars
    out = model.apply(variables, jax.random.key(5), batch,
                      method=TTSModel.reconstruct)
    assert out["mel"].shape == (2, 16, 8)
    assert out["durations"].shape == (2, 7)
    # durations from MAS cover the mel length
    d = np.asarray(out["durations"])
    np.testing.assert_array_equal(d.sum(1),
                                  np.asarray(batch["output_lengths"]))


def test_ganged_frame_predictors_match_separate(model_and_vars):
    """gang_frame_predictors=True (one fused 6-lane BiLSTM scan for
    f0/energy/voiced) produces the same param tree, outputs, and gradients
    as three separate predictor calls."""
    model, variables, batch = model_and_vars
    assert model.config.gang_frame_predictors  # default on
    sep_model = TTSModel(config=tiny_config(gang_frame_predictors=False))

    # identical checkpoint layout: the split-phase calls create the exact
    # same params (names + shapes)
    sep_vars = sep_model.init(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)},
        batch, binarize=False, train=True)
    assert (jax.tree.structure(sep_vars["params"])
            == jax.tree.structure(variables["params"]))
    for a, b in zip(jax.tree.leaves(sep_vars["params"]),
                    jax.tree.leaves(variables["params"])):
        assert a.shape == b.shape

    kw = dict(binarize=True, train=False, mutable=["spectral"])
    out_g, _ = model.apply(variables, batch, **kw)
    out_s, _ = sep_model.apply(variables, batch, **kw)

    def head_loss(m, v):
        out, _ = m.apply(v, batch, **kw)
        return sum(jnp.sum(out[k]["x_hat"] ** 2)
                   for k in ("f0_outputs", "energy_outputs",
                             "voiced_outputs"))

    for k in ("f0_outputs", "energy_outputs", "voiced_outputs"):
        np.testing.assert_allclose(np.asarray(out_g[k]["x_hat"]),
                                   np.asarray(out_s[k]["x_hat"]), atol=1e-5)
        np.testing.assert_allclose(np.asarray(out_g[k]["x"]),
                                   np.asarray(out_s[k]["x"]), atol=0)
    g_g = jax.grad(lambda p: head_loss(
        model, {**variables, "params": p}))(variables["params"])
    g_s = jax.grad(lambda p: head_loss(
        sep_model, {**variables, "params": p}))(variables["params"])
    for a, b in zip(jax.tree.leaves(g_g), jax.tree.leaves(g_s)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)


def test_ganged_infer_matches_separate(model_and_vars):
    """The ganged inference path (voiced/f0/energy in one fused scan)
    matches three separate predictor.infer calls."""
    model, variables, batch = model_and_vars
    sep_model = TTSModel(config=tiny_config(gang_frame_predictors=False))
    kw = dict(accent_ids=batch["accent_ids"], sigma=0.8, max_frames=64,
              method=TTSModel.infer)
    out_g = model.apply(variables, jax.random.key(7), batch["text"],
                        batch["input_lengths"], batch["speaker_ids"], **kw)
    out_s = sep_model.apply(variables, jax.random.key(7), batch["text"],
                            batch["input_lengths"], batch["speaker_ids"],
                            **kw)
    for k in ("durations", "voiced", "f0", "energy", "mel"):
        np.testing.assert_allclose(np.asarray(out_g[k]),
                                   np.asarray(out_s[k]), atol=1e-5)
