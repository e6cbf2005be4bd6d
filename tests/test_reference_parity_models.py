"""Whole-submodule parity vs the reference with copied weights:
text Encoder, ConvAttention, ConvLSTMLinear."""
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


def copy_convnorm(ref_conv, weight_normed=True):
    if weight_normed:
        return {"v": ref_conv.conv.weight_v.detach().numpy()
                .transpose(2, 1, 0),
                "g": ref_conv.conv.weight_g.detach().numpy().reshape(-1),
                "bias": ref_conv.conv.bias.detach().numpy()}
    return {"kernel": ref_conv.conv.weight.detach().numpy()
            .transpose(2, 1, 0),
            "bias": ref_conv.conv.bias.detach().numpy()}


def copy_lstm(ref_lstm, spectral=False):
    """torch LSTM -> our MaskedLSTM params. With spectral norm, materialize
    the effective weight_hh (one power iteration applied by torch at
    forward; in eval torch uses the stored weight_hh computed at last
    train-mode forward — we instead copy weight_hh_orig and run our own
    power iteration with torch's u, giving identical sigma)."""
    p = {}
    def get(name):
        return getattr(ref_lstm, name).detach().numpy()
    if spectral:
        # torch's spectral_norm stores weight_hh_l0_orig + u; the effective
        # weight used in eval() is precomputed; easiest: run the module once
        # in eval to materialize, then read the plain attribute
        wh_f = ref_lstm.weight_hh_l0.detach().numpy()
        wh_b = ref_lstm.weight_hh_l0_reverse.detach().numpy()
    else:
        wh_f = get("weight_hh_l0")
        wh_b = get("weight_hh_l0_reverse")
    p["wi_fwd"] = get("weight_ih_l0").T
    p["wh_fwd"] = wh_f.T
    p["b_ih_fwd"] = get("bias_ih_l0")
    p["b_hh_fwd"] = get("bias_hh_l0")
    p["wi_bwd"] = get("weight_ih_l0_reverse").T
    p["wh_bwd"] = wh_b.T
    p["b_ih_bwd"] = get("bias_ih_l0_reverse")
    p["b_hh_bwd"] = get("bias_hh_l0_reverse")
    return p


def test_text_encoder_matches_reference(rng):
    import common as ref_common
    from radmmm_tpu.models.encoder import TextEncoder
    from radmmm_tpu.utils.masking import SeqLens

    dim = 16
    torch.manual_seed(0)
    ref = ref_common.Encoder(encoder_n_convolutions=2,
                             encoder_embedding_dim=dim,
                             encoder_kernel_size=5, lstm_norm_fn=None)
    ref.eval()

    B, T = 3, 13
    x = rng.standard_normal((B, T, dim)).astype(np.float32)
    lens = np.array([13, 9, 6], np.int32)

    params = {}
    for i, seq in enumerate(ref.convolutions):
        conv, inorm = seq[0], seq[1]
        params[f"conv_{i}"] = copy_convnorm(conv, weight_normed=True)
        params[f"norm_{i}"] = {
            "scale": inorm.weight.detach().numpy(),
            "bias": inorm.bias.detach().numpy()}
    params["lstm"] = copy_lstm(ref.lstm)

    ours = TextEncoder(encoder_n_convolutions=2, encoder_embedding_dim=dim,
                       lstm_norm_fn=None)
    sl = SeqLens.create(jnp.asarray(lens), T)
    got = np.asarray(ours.apply({"params": params}, jnp.asarray(x),
                                sl.mask, train=False))

    with torch.no_grad():
        want = ref(torch.from_numpy(x.transpose(0, 2, 1)),
                   torch.from_numpy(lens.astype(np.int64))).numpy()
    for b, L in enumerate(lens):
        np.testing.assert_allclose(got[b, :L], want[b, :L], atol=2e-4,
                                   err_msg=f"item {b}")
    # padding zeroed (pad_packed_sequence semantics)
    assert np.abs(got[2, 6:]).max() < 1e-6
    assert np.abs(want[2, 6:]).max() < 1e-6


def test_conv_attention_matches_reference(rng):
    import common as ref_common
    from radmmm_tpu.ops.attention import ConvAttention

    n_mel, n_txt, n_att = 8, 12, 8
    torch.manual_seed(1)
    ref = ref_common.ConvAttention(n_mel, n_txt, n_att)
    ref.eval()

    B, T_mel, T_text = 2, 14, 6
    mel = rng.standard_normal((B, T_mel, n_mel)).astype(np.float32)
    keys = rng.standard_normal((B, T_text, n_txt)).astype(np.float32)
    prior = rng.uniform(0.05, 1.0, (B, T_mel, T_text)).astype(np.float32)
    prior /= prior.sum(-1, keepdims=True)
    key_lens = np.array([6, 4], np.int32)

    params = {
        "key_proj_0": copy_convnorm(ref.key_proj[0]),
        "key_proj_1": copy_convnorm(ref.key_proj[2]),
        "query_proj_0": copy_convnorm(ref.query_proj[0]),
        "query_proj_1": copy_convnorm(ref.query_proj[2]),
        "query_proj_2": copy_convnorm(ref.query_proj[4]),
    }
    ours = ConvAttention(n_mel, n_txt, n_att)
    key_mask = jnp.asarray(np.arange(T_text)[None, :] < key_lens[:, None])
    attn, attn_logprob = ours.apply({"params": params}, jnp.asarray(mel),
                                    jnp.asarray(keys), key_mask,
                                    jnp.asarray(prior))

    # reference mask shape: (B, T_text, 1) bool, True = masked
    # (tts_lightning_modules.py:450 + common.py:1272-1274)
    mask_ref = torch.from_numpy(
        (np.arange(T_text)[None, :] >= key_lens[:, None])[:, :, None])
    with torch.no_grad():
        want_attn, want_logprob = ref(
            torch.from_numpy(mel.transpose(0, 2, 1)),
            torch.from_numpy(keys.transpose(0, 2, 1)),
            None, mask=mask_ref,
            attn_prior=torch.from_numpy(prior))
    np.testing.assert_allclose(np.asarray(attn),
                               want_attn.numpy()[:, 0], atol=1e-5)
    np.testing.assert_allclose(np.asarray(attn_logprob),
                               want_logprob.numpy()[:, 0], atol=1e-5)


def test_conv_lstm_linear_matches_reference(rng):
    import common as ref_common
    from radmmm_tpu.models.attributes import ConvLSTMLinear
    from radmmm_tpu.utils.masking import SeqLens

    in_dim, out_dim, n_ch = 10, 3, 8
    torch.manual_seed(2)
    ref = ref_common.ConvLSTMLinear(in_dim=in_dim, out_dim=out_dim,
                                    n_layers=2, n_channels=n_ch,
                                    kernel_size=3, p_dropout=0.1)
    ref.eval()

    B, T = 3, 12
    x = rng.standard_normal((B, T, in_dim)).astype(np.float32)
    lens = np.array([12, 8, 5], np.int32)

    # the reference strips spectral/weight norms before inference
    # (remove_norms, models/radmmm.py:150-168); compare in that config
    torch.nn.utils.remove_spectral_norm(ref.bilstm, "weight_hh_l0")
    torch.nn.utils.remove_spectral_norm(ref.bilstm, "weight_hh_l0_reverse")

    params = {}
    for i, conv in enumerate(ref.convolutions):
        params[f"conv_{i}"] = copy_convnorm(conv)
    params["lstm"] = copy_lstm(ref.bilstm)
    params["dense"] = {"kernel": ref.dense.weight.detach().numpy().T,
                       "bias": ref.dense.bias.detach().numpy()}

    ours = ConvLSTMLinear(out_dim=out_dim, n_layers=2, n_channels=n_ch,
                          kernel_size=3, p_dropout=0.1, spectral_norm=False)
    sl = SeqLens.create(jnp.asarray(lens), T)
    got = np.asarray(ours.apply({"params": params},
                                jnp.asarray(x), sl, train=False))

    with torch.no_grad():
        want = ref(torch.from_numpy(x.transpose(0, 2, 1)),
                   ref_common.SequenceLength(
                       torch.from_numpy(lens.astype(np.int64))))
    want = want.numpy().transpose(0, 2, 1)
    for b, L in enumerate(lens):
        np.testing.assert_allclose(got[b, :L], want[b, :L], atol=5e-3,
                                   err_msg=f"item {b}")
