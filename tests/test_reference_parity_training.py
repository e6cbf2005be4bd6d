"""Training-DYNAMICS parity vs the torch reference (VERDICT r3 Next #1).

Forward parity was proven in rounds 2-3 (full decoder / encoder / attention /
losses with copied weights). This file proves the *backward pass and the
optimizer trajectory*: it instantiates the reference's actual
`tts_lightning_modules.TTSModel` (the real `training_step`,
tts_lightning_modules.py:643-750), copies every weight into our flax
TTSModel, and asserts

  1. every loss term's VALUE matches on an identical batch,
  2. the gradient of the total loss — and of each loss term separately —
     matches across the ENTIRE parameter tree (straight-through MAS,
     detached predictor contexts, spectral-norm sigma gradients, masked
     losses, CTC backward, flow NLL backward),
  3. a multi-step RAdam trajectory (the reference's radam.py vs our
     optax radam_exact) tracks step for step, in both the soft-attention
     phase and the binarized (+KL) phase.

pytorch_lightning / torchvision / librosa / lmdb / numba / parselmouth are
not installed in this image; they are stubbed with just enough surface for
the reference import chain (none of their functionality is on the tested
path — the LightningModule base only contributes `log`/`global_step`
plumbing, which the reference overrides with real logic we capture).
"""
import os
import sys
import types

import numpy as np
import pytest

REF = "/root/reference"
pytestmark = pytest.mark.skipif(not os.path.isdir(REF),
                                reason="reference repo not mounted")

if os.path.isdir(REF):
    for p in (REF, os.path.join(REF, "vocoders")):
        if p not in sys.path:
            sys.path.insert(0, p)

import torch  # noqa: E402


def _stub_module(name, **attrs):
    mod = sys.modules.get(name) or types.ModuleType(name)
    for k, v in attrs.items():
        setattr(mod, k, v)
    sys.modules[name] = mod
    return mod


# ---- stubs for the reference import chain (see module docstring) ----------
if "numba" not in sys.modules:
    _stub_module("numba", jit=lambda *a, **k: (lambda f: f))

_stub_module("torchvision")
_stub_module("lmdb")

_lib = _stub_module("librosa", pyin=None)
_lib.filters = _stub_module("librosa.filters", mel=None)
_lib.util = _stub_module("librosa.util", normalize=None, pad_center=None,
                         tiny=None)

_pm = _stub_module("parselmouth", Sound=None)
_pm.praat = _stub_module("parselmouth.praat", call=None)

# text-frontend normalizer deps; the training path never cleans raw text
if "unidecode" not in sys.modules:
    _stub_module("unidecode", unidecode=lambda s: s)
if "inflect" not in sys.modules:
    _stub_module("inflect",
                 engine=lambda: types.SimpleNamespace(
                     number_to_words=lambda *a, **k: ""))


class _StubLightningModule(torch.nn.Module):
    """Just enough LightningModule surface for TTSModel's training path."""
    global_rank = 0

    def __init__(self):
        super().__init__()
        self._fake_global_step = 0
        self._logged = {}

    @property
    def global_step(self):
        return self._fake_global_step

    def log(self, name, value, **kw):
        self._logged[name] = value


_pl = _stub_module("pytorch_lightning",
                   LightningModule=_StubLightningModule,
                   LightningDataModule=type("LightningDataModule", (), {}))
_pl.callbacks = _stub_module("pytorch_lightning.callbacks",
                             ModelCheckpoint=type("ModelCheckpoint", (), {}),
                             Callback=type("Callback", (), {}))

import tts_lightning_modules as tlm  # noqa: E402
import loss as ref_loss  # noqa: E402
import decoders as ref_decoders  # noqa: E402
import common as ref_common  # noqa: E402
import attribute_predictors as ref_ap  # noqa: E402
from radam import RAdam as RefRAdam  # noqa: E402

# the ctor loads a HiFi-GAN vocoder from disk paths we don't have, and a
# TextProcessing used only at inference; neither is on the training path
# (tts_lightning_modules.py:104-118, 204-214)
tlm.get_vocoder = lambda **kw: (None, None)
tlm.TextProcessing = lambda *a, **k: None

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from radmmm_tpu.models.tts import TTSModel, TTSConfig  # noqa: E402
from radmmm_tpu.training.step import (LossConfig, compute_losses,  # noqa: E402
                                      total_loss, make_train_step, TrainState)
from radmmm_tpu.training.optim import radam_exact  # noqa: E402

# ---- shared small-model hyperparameters ------------------------------------
B, TT, TM, C_MEL = 2, 7, 12, 8
N_TOKENS, N_TEXT_DIM, N_SPK, SPK_DIM, N_ACC, ACC_DIM = 32, 12, 3, 4, 2, 2
ENC_DIM = N_TEXT_DIM + ACC_DIM  # accent emb concatenated for the encoder

DEC_KW = dict(n_speaker_dim=SPK_DIM, use_accent=True, n_accent_dim=ACC_DIM,
              n_text_dim=ENC_DIM, n_group_size=2, n_mel_channels=C_MEL,
              n_f0_dims=1, n_energy_avg_dims=1, context_w_f0_and_energy=True,
              use_context_lstm=True, context_lstm_norm=None, n_flows=3,
              n_conv_layers_per_step=2, n_early_size=2, n_early_every=2,
              affine_model="wavenet", scaling_fn="tanh",
              affine_activation="softplus", use_partial_padding=True,
              use_accent_emb_for_decoder=False)
DAP_KW = dict(n_speaker_dim=SPK_DIM, n_accent_dim=ACC_DIM,
              use_accent_embedding=True, in_dim=ENC_DIM, out_dim=1,
              reduction_factor=2, n_backbone_layers=2, n_hidden=16,
              kernel_size=3, p_dropout=0.0, lstm_type="bilstm")
DAP_EXTRA = {"f0": dict(target_offset=-5.0),
             "energy": dict(target_offset=-0.75),
             "voiced": {},
             "duration": dict(log_target=True)}
REG_W = dict(variance=0.5, covariance=0.25)
CROSS_W = 1.0


@pytest.fixture(autouse=True)
def _no_torch_dropout():
    """The reference Encoder hardcodes dropout 0.5 (common.py:474); for a
    deterministic gradient comparison all dropout is disabled on both sides
    (ours via p_dropout=0.0 config, torch via this functional no-op)."""
    import torch.nn.functional as F
    orig = F.dropout
    F.dropout = lambda input, p=0.5, training=False, inplace=False: input
    yield
    F.dropout = orig


def _cpu_binarize(self, attn, in_lens, out_lens):
    """CPU-safe transliteration of TTSModel.binarize_attention
    (tts_lightning_modules.py:270-284) — the original calls
    `attn.get_device()`, which is CUDA-only. Identical math."""
    from alignment import mas_width1 as mas
    with torch.no_grad():
        attn_cpu = attn.data.cpu().numpy()
        attn_out = torch.zeros_like(attn)
        for ind in range(attn.shape[0]):
            hard = mas(attn_cpu[ind, 0, :out_lens[ind], :in_lens[ind]])
            attn_out[ind, 0, :out_lens[ind], :in_lens[ind]] = \
                torch.tensor(hard, dtype=attn.dtype)
    return attn_out


def make_ref_model():
    """The reference TTSModel wired exactly like the shipped RADMMM recipe
    (configs/RADMMM_model_config.yaml + attribute configs), at test dims."""
    torch.manual_seed(0)
    decoder = ref_decoders.RADMMMFlow(**DEC_KW)
    decoder_loss = ref_loss.RADMMMLoss(
        sigma=1.0, n_group_size=2, CTC_blank_logprob=-1,
        kl_loss_start_iter=10 ** 9, binarization_loss_weight=1.0,
        ctc_loss_weight=0.1)
    text_encoder = ref_common.Encoder(
        encoder_n_convolutions=2, encoder_embedding_dim=ENC_DIM,
        encoder_kernel_size=5, lstm_norm_fn="spectral")
    preds, pred_losses = {}, {}
    for name, extra in DAP_EXTRA.items():
        preds[name] = ref_ap.ConvLSTMLinearDAP(**{**DAP_KW, **extra})
        pred_losses[name] = ref_loss.AttributeRegressionLoss(
            prefix=("vpred_" if name == "voiced" else f"{name}_"), weight=1.0)
    model = tlm.TTSModel(
        decoder=decoder, decoder_loss=decoder_loss, text_encoder=text_encoder,
        f0_predictor=preds["f0"], f0_predictor_loss=pred_losses["f0"],
        energy_predictor=preds["energy"],
        energy_predictor_loss=pred_losses["energy"],
        voiced_predictor=preds["voiced"],
        voiced_predictor_loss=pred_losses["voiced"],
        duration_predictor=preds["duration"],
        duration_predictor_loss=pred_losses["duration"],
        speaker_embed_regularization_loss=
        ref_loss.VarianceCovarianceEmbeddingRegLoss(
            "speaker", REG_W["variance"], REG_W["covariance"]),
        accent_embed_regularization_loss=
        ref_loss.VarianceCovarianceEmbeddingRegLoss(
            "accent", REG_W["variance"], REG_W["covariance"]),
        speaker_accent_cross_regularization_loss=
        ref_loss.AttributeMinCrossCovarianceRegLoss(
            "speaker", "accent", CROSS_W),
        optim_algo="RAdam", learning_rate=2e-4, weight_decay=1e-6, sigma=1.0,
        binarization_start_iter=10 ** 9, f0_loss_voiced_only=True,
        n_speakers=N_SPK, n_speaker_dim=SPK_DIM, use_accent=True,
        n_accents=N_ACC, n_accent_dim=ACC_DIM, n_text_dim=N_TEXT_DIM,
        n_text_tokens=N_TOKENS, lstm_norm_fn="spectral",
        n_mel_channels=C_MEL, use_accent_emb_for_encoder=True,
        use_accent_emb_for_alignment=False, use_speaker_emb_for_alignment=True,
        heteronyms_path=os.path.join(REF, "tts_text_processing/heteronyms"),
        phoneme_dict_path=os.path.join(REF, "tts_text_processing/cmudict-0.7b"))
    model.binarize_attention = types.MethodType(_cpu_binarize, model)

    # pre-initialize the data-dependent whitening layer with a fixed,
    # well-conditioned transform so both frameworks share it exactly
    # (the in-graph torch init path, common.py:594-597, is separately
    # matched by our make_whitening_init — tested in test_training.py)
    g = torch.Generator().manual_seed(7)
    inv = model.decoder.flows[0].invtbl_conv
    c = inv.upper_diag.shape[0]
    with torch.no_grad():
        inv.upper.copy_(torch.triu(
            0.1 * torch.randn(c, c, generator=g), 1))
        inv.upper_diag.copy_(1.0 + 0.1 * torch.rand(c, generator=g))
        inv.input_mean.copy_(0.1 * torch.randn(c, 1, generator=g))
        inv.initialized.fill_(True)
    model.train()
    return model


def make_our_model():
    cfg = TTSConfig(
        n_text_tokens=N_TOKENS, n_text_dim=N_TEXT_DIM, n_speakers=N_SPK,
        n_speaker_dim=SPK_DIM, use_accent=True, n_accents=N_ACC,
        n_accent_dim=ACC_DIM, n_mel_channels=C_MEL,
        use_accent_emb_for_encoder=True, use_accent_emb_for_alignment=False,
        use_speaker_emb_for_alignment=True, encoder_n_convolutions=2,
        encoder_kernel_size=5, encoder_p_dropout=0.0, lstm_norm_fn="spectral",
        f0_loss_voiced_only=True, decoder=DEC_KW,
        f0_predictor={**DAP_KW, **DAP_EXTRA["f0"]},
        energy_predictor={**DAP_KW, **DAP_EXTRA["energy"]},
        voiced_predictor={**DAP_KW, **DAP_EXTRA["voiced"]},
        duration_predictor={**DAP_KW, **DAP_EXTRA["duration"]})
    return TTSModel(cfg)


def make_loss_config():
    return LossConfig(
        sigma=1.0, n_group_size=2, ctc_blank_logprob=-1.0,
        binarization_loss_weight=1.0, ctc_loss_weight=0.1,
        f0_loss_voiced_only=True, vpred_loss_type="regression",
        speaker_reg=dict(REG_W), accent_reg=dict(REG_W),
        cross_covariance_weight=CROSS_W)


# ---- batch -----------------------------------------------------------------

def make_batch():
    rng = np.random.default_rng(11)
    in_lens = np.array([TT, TT - 2], np.int32)
    out_lens = np.array([TM, TM - 4], np.int32)
    text = rng.integers(1, N_TOKENS, (B, TT)).astype(np.int64)
    mel = (1.5 * rng.standard_normal((B, TM, C_MEL)) - 1.0).astype(np.float32)
    voiced = rng.integers(0, 2, (B, TM)).astype(np.float32)
    f0 = (rng.uniform(4.5, 6.2, (B, TM)).astype(np.float32)) * voiced
    energy = rng.uniform(0.05, 1.0, (B, TM)).astype(np.float32)
    prior = rng.uniform(0.05, 1.0, (B, TM, TT)).astype(np.float32)
    for b in range(B):
        text[b, in_lens[b]:] = 0
        mel[b, out_lens[b]:] = 0.0
        voiced[b, out_lens[b]:] = 0.0
        f0[b, out_lens[b]:] = 0.0
        energy[b, out_lens[b]:] = 0.0
        prior[b, :, in_lens[b]:] = 0.0
        prior[b, out_lens[b]:, :] = 0.0
        prior[b, :out_lens[b], :in_lens[b]] /= \
            prior[b, :out_lens[b], :in_lens[b]].sum(-1, keepdims=True)
    return {
        "text": text, "input_lengths": in_lens,
        "mel": mel, "output_lengths": out_lens,
        "speaker_ids": np.array([0, 2], np.int64),
        "accent_ids": np.array([1, 0], np.int64),
        "f0": f0, "voiced_mask": voiced, "p_voiced": voiced,
        "energy_avg": energy, "attn_prior": prior,
        "speaker_f0_mean": np.array([5.3, 5.6], np.float32),
        "speaker_f0_std": np.array([0.4, 0.5], np.float32),
        "speaker_energy_mean": np.array([0.5, 0.5], np.float32),
        "speaker_energy_std": np.array([0.2, 0.2], np.float32),
    }


def torch_batch(b):
    t = lambda x: torch.from_numpy(np.asarray(x))
    return {
        "mel": t(b["mel"].transpose(0, 2, 1)),        # reference: (B, C, T)
        "speaker_ids": t(b["speaker_ids"]), "accent_ids": t(b["accent_ids"]),
        "text": t(b["text"]),
        "input_lengths": t(b["input_lengths"].astype(np.int64)),
        "output_lengths": t(b["output_lengths"].astype(np.int64)),
        "attn_prior": t(b["attn_prior"]), "f0": t(b["f0"]),
        "voiced_mask": t(b["voiced_mask"]), "p_voiced": t(b["p_voiced"]),
        "energy_avg": t(b["energy_avg"]),
        "speaker_f0_mean": t(b["speaker_f0_mean"]),
        "speaker_f0_std": t(b["speaker_f0_std"]),
        "speaker_energy_mean": t(b["speaker_energy_mean"]),
        "speaker_energy_std": t(b["speaker_energy_std"]),
        "language": ["en_US"] * B, "audiopaths": ["a", "b"],
        "text_raw": ["x", "y"],
    }


def jax_batch(b):
    out = {}
    for k, v in b.items():
        arr = np.asarray(v)
        if arr.dtype == np.int64:
            arr = arr.astype(np.int32)
        out[k] = jnp.asarray(arr)
    return out


# ---- weight / gradient tree builders ---------------------------------------

def _wget(t):
    return t.detach().numpy().astype(np.float32)


def _gget(t):
    g = t.grad
    return (np.zeros(tuple(t.shape), np.float32) if g is None
            else g.detach().numpy().astype(np.float32))


def conv_wn(c, get):
    """torch weight-normed Conv1d -> our MaskedConv1d {v, g, bias}."""
    return {"v": get(c.weight_v).transpose(2, 1, 0),
            "g": get(c.weight_g).reshape(-1), "bias": get(c.bias)}


def conv_plain(c, get):
    return {"kernel": get(c.weight).transpose(2, 1, 0), "bias": get(c.bias)}


def lstm_tree(l, get, spectral):
    def wh(name):
        return get(getattr(l, name + ("_orig" if spectral else "")))
    return {"wi_fwd": get(l.weight_ih_l0).T, "wh_fwd": wh("weight_hh_l0").T,
            "b_ih_fwd": get(l.bias_ih_l0), "b_hh_fwd": get(l.bias_hh_l0),
            "wi_bwd": get(l.weight_ih_l0_reverse).T,
            "wh_bwd": wh("weight_hh_l0_reverse").T,
            "b_ih_bwd": get(l.bias_ih_l0_reverse),
            "b_hh_bwd": get(l.bias_hh_l0_reverse)}


def lstm_spectral_u(l):
    return {"SpectralNormedParam_0": {"wh_fwd_u": _wget(l.weight_hh_l0_u)},
            "SpectralNormedParam_1":
                {"wh_bwd_u": _wget(l.weight_hh_l0_reverse_u)}}


def wn_tree(wn, n_layers, get):
    p = {"start": conv_wn(wn.start, get),
         "end": conv_plain(wn.end, get)}
    for i in range(n_layers):
        p[f"in_{i}"] = conv_wn(wn.in_layers[i].conv, get)
        p[f"res_skip_{i}"] = conv_wn(wn.res_skip_layers[i], get)
    return p


def dap_tree(p, get):
    f = p.feat_pred_fn
    backbone = {"dense": {"kernel": get(f.dense.weight).T,
                          "bias": get(f.dense.bias)},
                "lstm": lstm_tree(f.bilstm, get, spectral=True)}
    for i, conv in enumerate(f.convolutions):
        backbone[f"conv_{i}"] = conv_wn(conv.conv, get)
    return {"bottleneck":
            {"proj": conv_wn(p.bottleneck_layer.projection_fn.conv, get)},
            "backbone": backbone}


def build_param_tree(m, get):
    """Our flax 'params' tree built from the reference module's tensors.

    With get=_wget this copies weights; with get=_gget it maps the torch
    gradient of every parameter onto our tree for leaf-by-leaf comparison.
    """
    params = {
        "text_embeddings": {"embedding": get(m.text_embeddings.weight)},
        "speaker_embeddings": {"embedding": get(m.speaker_embeddings.weight)},
        "accent_embeddings": {"embedding": get(m.accent_embeddings.weight)},
    }
    enc = {"lstm": lstm_tree(m.text_encoder.lstm, get, spectral=True)}
    for i, seq in enumerate(m.text_encoder.convolutions):
        enc[f"conv_{i}"] = conv_wn(seq[0].conv, get)
        enc[f"norm_{i}"] = {"scale": get(seq[1].weight),
                            "bias": get(seq[1].bias)}
    params["text_encoder"] = enc

    att = {}
    for ours, theirs in (("key_proj_0", m.attention.key_proj[0]),
                         ("key_proj_1", m.attention.key_proj[2]),
                         ("query_proj_0", m.attention.query_proj[0]),
                         ("query_proj_1", m.attention.query_proj[2]),
                         ("query_proj_2", m.attention.query_proj[4])):
        att[ours] = conv_wn(theirs.conv, get)
    params["attention"] = att

    dec = {"context_lstm": lstm_tree(m.decoder.context_lstm, get,
                                     spectral=False)}
    for i, flow in enumerate(m.decoder.flows):
        inv = flow.invtbl_conv
        fp = {"coupling": {"wn": wn_tree(
            flow.coupling_tfn.affine_param_predictor,
            DEC_KW["n_conv_layers_per_step"], get)}}
        if i == 0:
            fp["invtbl_conv"] = {"upper": get(inv.upper),
                                 "upper_diag": get(inv.upper_diag)}
        else:
            fp["invtbl_conv"] = {"lower": get(inv.lower),
                                 "upper": get(inv.upper),
                                 "upper_diag": get(inv.upper_diag)}
        dec[f"flow_{i}"] = fp
    params["decoder"] = dec

    for name in ("f0", "energy", "voiced", "duration"):
        params[f"{name}_predictor"] = dap_tree(
            getattr(m, f"{name}_predictor"), get)
    return params


def build_variables(m):
    params = build_param_tree(m, _wget)
    buffers = {"decoder": {}}
    for i, flow in enumerate(m.decoder.flows):
        inv = flow.invtbl_conv
        if i == 0:
            buffers["decoder"][f"flow_{i}"] = {"invtbl_conv": {
                "input_mean": _wget(inv.input_mean)[:, 0],
                "initialized": np.ones((), bool)}}
        else:
            buffers["decoder"][f"flow_{i}"] = {"invtbl_conv": {
                "p": _wget(inv.p)}}
    spectral = {"text_encoder": {"lstm": lstm_spectral_u(m.text_encoder.lstm)}}
    for name in ("f0", "energy", "voiced", "duration"):
        p = getattr(m, f"{name}_predictor")
        spectral[f"{name}_predictor"] = {
            "backbone": {"lstm": lstm_spectral_u(p.feat_pred_fn.bilstm)}}
    to_j = lambda tree: jax.tree_util.tree_map(jnp.asarray, tree)
    return {"params": to_j(params), "buffers": to_j(buffers),
            "spectral": to_j(spectral)}


# ---- comparison helpers -----------------------------------------------------

def assert_tree_close(got, want, frac, label, floor=1e-7):
    """Leaf-by-leaf gradient comparison with a per-leaf scale-relative
    absolute tolerance: |got - want| <= frac * max|want| + floor.

    A semantic backward divergence (missing stop_gradient, wrong mask,
    different loss normalization) shifts gradients by O(scale); composed
    fp32 noise between two frameworks stays well under 1% of scale."""
    got_f = jax.tree_util.tree_flatten_with_path(got)[0]
    want_f = jax.tree_util.tree_flatten_with_path(want)[0]
    assert len(got_f) == len(want_f)
    for (pg, g), (pw, w) in zip(got_f, want_f):
        path = "/".join(str(getattr(k, "key", k)) for k in pg)
        assert path == "/".join(str(getattr(k, "key", k)) for k in pw)
        g, w = np.asarray(g), np.asarray(w)
        scale = max(float(np.abs(w).max()), float(np.abs(g).max()))
        np.testing.assert_allclose(g, w, rtol=0.0,
                                   atol=frac * scale + floor,
                                   err_msg=f"{label}: {path}")


def set_phase(ref, binarize):
    """Select the training phase on the reference model: pre-binarization
    (soft attention, no KL) or binarization+KL (steady state)."""
    if binarize:
        ref.binarization_start_iter = 0
        ref.decoder_criterion.attn_loss.kl_loss_start_iter = 0
        ref._fake_global_step = 1
    else:
        ref.binarization_start_iter = 10 ** 9
        ref.decoder_criterion.attn_loss.kl_loss_start_iter = 10 ** 9
        ref._fake_global_step = 1


# ---- fixtures ----------------------------------------------------------------

@pytest.fixture(scope="module")
def setup():
    ref = make_ref_model()
    saved = {k: v.clone() for k, v in ref.state_dict().items()}
    variables = build_variables(ref)
    ours = make_our_model()
    batch = make_batch()
    return dict(ref=ref, saved=saved, variables=variables, ours=ours,
                batch=batch)


def run_torch_step(ref, batch):
    """One reference training_step; returns (total, {term: tensor})."""
    ref._logged = {}
    total = ref.training_step(torch_batch(batch), 0)
    terms = {k[len("train/"):]: v for k, v in ref._logged.items()
             if k.startswith("train/")}
    return total, terms


def make_jax_loss_fn(ours, binarize):
    cfg = make_loss_config()

    def fn(params, variables, batch, weights):
        outputs, _ = ours.apply(
            {"params": params, "buffers": variables["buffers"],
             "spectral": variables["spectral"]},
            batch, binarize=binarize, train=True,
            mutable=["spectral"], rngs={"dropout": jax.random.key(0)})
        ld = compute_losses(ours, cfg, params, outputs, batch,
                            binarization_on=binarize)
        tot = sum(v * weights[k] for k, (v, w) in ld.items())
        return tot, {k: v for k, (v, w) in ld.items()}

    return fn, cfg


# ---- tests -------------------------------------------------------------------

@pytest.mark.parametrize("binarize", [False, True],
                         ids=["soft_phase", "binarized_kl_phase"])
def test_training_step_gradients_match_reference(setup, binarize):
    ref, ours, batch = setup["ref"], setup["ours"], setup["batch"]
    ref.load_state_dict(setup["saved"])
    ref.train()
    set_phase(ref, binarize)

    # ---- torch side: one training_step, then per-term + total backward
    total_t, terms_t = run_torch_step(ref, batch)
    tensor_terms = {k: v for k, v in terms_t.items()
                    if torch.is_tensor(v) and v.requires_grad}
    ref.zero_grad(set_to_none=True)
    total_t.backward(retain_graph=True)
    grads_t = {"__total__": build_param_tree(ref, _gget)}
    for k, v in tensor_terms.items():
        ref.zero_grad(set_to_none=True)
        v.backward(retain_graph=True)
        grads_t[k] = build_param_tree(ref, _gget)
    ref.zero_grad(set_to_none=True)

    # ---- jax side: one jitted grad fn, re-weighted per term
    fn, cfg = make_jax_loss_fn(ours, binarize)
    grad_fn = jax.jit(jax.value_and_grad(fn, has_aux=True))
    bj = jax_batch(batch)
    params = setup["variables"]["params"]

    # the actual per-term weights, as our compute_losses declares them
    ld = compute_losses(
        ours, cfg, params,
        ours.apply({"params": params,
                    "buffers": setup["variables"]["buffers"],
                    "spectral": setup["variables"]["spectral"]},
                   bj, binarize=binarize, train=True,
                   mutable=["spectral"],
                   rngs={"dropout": jax.random.key(0)})[0],
        bj, binarization_on=binarize)
    weights = {k: float(w) for k, (v, w) in ld.items()}

    (total_j, vals_j), grad_total_j = grad_fn(
        params, setup["variables"], bj, weights)

    # 1) every loss term's value matches
    for k, v in terms_t.items():
        want = float(v) if not torch.is_tensor(v) else float(v.detach())
        got = float(vals_j[k])
        # composed fp32 noise: the flow z itself is only ~5e-4-tight
        # (test_reference_parity_decoder.py), and the predictors amplify
        # the ~1e-5 context difference through conv+BiLSTM stacks
        np.testing.assert_allclose(
            got, want, rtol=2e-3, atol=5e-5,
            err_msg=f"loss term {k} (binarize={binarize})")
    np.testing.assert_allclose(float(total_j), float(total_t.detach()),
                               rtol=2e-3, atol=5e-5)

    # 2) gradient of the total loss across the entire parameter tree
    assert_tree_close(grad_total_j, grads_t["__total__"],
                      frac=5e-3, label="grad(total)")

    # 3) gradient of each loss term separately (one-hot re-weighting
    #    reuses the single compiled executable)
    for k in tensor_terms:
        onehot = {name: (1.0 if name == k else 0.0) for name in weights}
        (_, _), grad_k = grad_fn(params, setup["variables"], bj, onehot)
        assert_tree_close(grad_k, grads_t[k], frac=5e-3,
                          label=f"grad({k})")


@pytest.mark.slow
@pytest.mark.parametrize("binarize", [True], ids=["binarized_kl_phase"])
def test_radam_trajectory_tracks_reference(setup, binarize):
    """~30 full train steps (reference radam.py vs optax radam_exact) on a
    fixed batch: the loss curves must track step for step. This covers the
    optimizer coupling with live gradients, spectral-norm u updates, and
    MAS re-binarization as the attention drifts."""
    n_steps, lr, wd = 30, 2e-4, 1e-6
    ref, ours, batch = setup["ref"], setup["ours"], setup["batch"]
    ref.load_state_dict(setup["saved"])
    ref.train()
    set_phase(ref, binarize)

    opt = RefRAdam(ref.parameters(), lr=lr, weight_decay=wd)
    losses_t = []
    for _ in range(n_steps):
        opt.zero_grad(set_to_none=True)
        loss, _ = run_torch_step(ref, batch)
        loss.backward()
        opt.step()
        losses_t.append(float(loss.detach()))

    cfg = make_loss_config()
    tx = radam_exact(lr, weight_decay=wd)
    step_fn = jax.jit(make_train_step(ours, cfg, tx, binarize=binarize,
                                      kl_on=binarize))
    variables = build_variables(ref)  # unused values; shapes for batch_stats
    params = setup["variables"]["params"]
    state = TrainState(step=jnp.zeros((), jnp.int32), params=params,
                       buffers=setup["variables"]["buffers"],
                       batch_stats={},
                       spectral=setup["variables"]["spectral"],
                       opt_state=tx.init(params))
    bj = jax_batch(batch)
    losses_j = []
    for i in range(n_steps):
        state, metrics = step_fn(state, bj, jax.random.key(i))
        losses_j.append(float(metrics["loss"]))

    losses_t = np.asarray(losses_t)
    losses_j = np.asarray(losses_j)
    rel = np.abs(losses_j - losses_t) / np.maximum(np.abs(losses_t), 1e-3)
    # fp32 drift compounds over steps; the curves must still track tightly
    assert rel[:5].max() < 2e-3, (rel, losses_t, losses_j)
    assert rel.max() < 2e-2, (rel, losses_t, losses_j)
    # and training must actually be making progress in both frameworks
    assert losses_t[-1] < losses_t[0]
    assert losses_j[-1] < losses_j[0]
