"""FULL flow-decoder forward parity vs the reference with copied weights.

Builds the reference RADMMMFlow (numba stubbed out — it is only needed for
the MAS import chain, not the decoder math), copies every parameter into our
RADMMMFlow, and compares z, log_s, logdets and the final flow loss on a
masked batch. This exercises the squeeze layout, context preprocessing
(unfold + concat order + context BiLSTM), LU/whitening 1x1s, WN couplings,
early exits, and loss normalization end to end.
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
    if REF not in sys.path:
        sys.path.insert(0, REF)
    # decoders.py imports hifigan_models from the vocoders dir (the
    # reference relies on the same sys.path hack, vocoder_utils.py:23)
    voc = os.path.join(REF, "vocoders")
    if voc not in sys.path:
        sys.path.insert(0, voc)

# stub numba (unavailable) before the reference import chain pulls it in
if "numba" not in sys.modules:
    numba_stub = types.ModuleType("numba")
    numba_stub.jit = lambda *a, **k: (lambda f: f)
    sys.modules["numba"] = numba_stub

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import torch  # noqa: E402


def conv_params(ref_conv, weight_normed=True):
    if weight_normed:
        return {"v": ref_conv.weight_v.detach().numpy().transpose(2, 1, 0),
                "g": ref_conv.weight_g.detach().numpy().reshape(-1),
                "bias": ref_conv.bias.detach().numpy()}
    return {"kernel": ref_conv.weight.detach().numpy().transpose(2, 1, 0),
            "bias": ref_conv.bias.detach().numpy()}


def wn_params(ref_wn, n_layers):
    p = {"start": conv_params(ref_wn.start),
         "end": conv_params(ref_wn.end, weight_normed=False)}
    for i in range(n_layers):
        p[f"in_{i}"] = conv_params(ref_wn.in_layers[i].conv)
        p[f"res_skip_{i}"] = conv_params(ref_wn.res_skip_layers[i])
    return p


def lstm_params(ref_lstm):
    g = lambda n: getattr(ref_lstm, n).detach().numpy()
    return {"wi_fwd": g("weight_ih_l0").T, "wh_fwd": g("weight_hh_l0").T,
            "b_ih_fwd": g("bias_ih_l0"), "b_hh_fwd": g("bias_hh_l0"),
            "wi_bwd": g("weight_ih_l0_reverse").T,
            "wh_bwd": g("weight_hh_l0_reverse").T,
            "b_ih_bwd": g("bias_ih_l0_reverse"),
            "b_hh_bwd": g("bias_hh_l0_reverse")}


def test_full_flow_decoder_matches_reference(rng):
    import decoders as ref_decoders
    import common as ref_common
    from radmmm_tpu.models.flow_decoder import RADMMMFlow
    from radmmm_tpu.losses.flow import compute_flow_loss
    from radmmm_tpu.utils.masking import SeqLens
    import loss as ref_loss

    torch.manual_seed(0)
    kw = dict(n_speaker_dim=4, use_accent=True, n_accent_dim=2,
              n_text_dim=12, n_group_size=2, n_mel_channels=8,
              n_f0_dims=1, n_energy_avg_dims=1,
              context_w_f0_and_energy=True, use_context_lstm=True,
              context_lstm_norm=None, n_flows=3,
              n_conv_layers_per_step=2, n_early_size=2, n_early_every=2,
              affine_model="wavenet", scaling_fn="tanh",
              affine_activation="softplus", use_partial_padding=True,
              use_accent_emb_for_decoder=False)
    ref = ref_decoders.RADMMMFlow(**kw)
    ref.eval()

    B, T = 2, 12
    mel = rng.standard_normal((B, T, 8)).astype(np.float32)
    spk = rng.standard_normal((B, 4)).astype(np.float32)
    ctx = rng.standard_normal((B, T, 12)).astype(np.float32)
    f0 = rng.uniform(0, 1, (B, T)).astype(np.float32)
    energy = rng.uniform(0, 1, (B, T)).astype(np.float32)
    acc = rng.standard_normal((B, 2)).astype(np.float32)
    lens = np.array([12, 8], np.int32)

    # ---- copy every parameter -----------------------------------------
    params = {"context_lstm": lstm_params(ref.context_lstm)}
    for i, flow in enumerate(ref.flows):
        fp = {}
        inv = flow.invtbl_conv
        if i == 0:  # whitening
            fp["invtbl_conv"] = {
                "upper": inv.upper.detach().numpy(),
                "upper_diag": inv.upper_diag.detach().numpy()}
            whit_buf = {"input_mean": inv.input_mean.detach().numpy()[:, 0],
                        "initialized": np.zeros((), bool)}
        else:
            fp["invtbl_conv"] = {
                "lower": inv.lower.detach().numpy(),
                "upper": inv.upper.detach().numpy(),
                "upper_diag": inv.upper_diag.detach().numpy()}
            fp_buf_p = inv.p.numpy()
            fp.setdefault("_p", fp_buf_p)
        fp["coupling"] = {"wn": wn_params(
            flow.coupling_tfn.affine_param_predictor, 2)}
        params[f"flow_{i}"] = fp

    buffers = {"flow_0": {"invtbl_conv": whit_buf}}
    for i in range(1, 3):
        buffers[f"flow_{i}"] = {
            "invtbl_conv": {"p": params[f"flow_{i}"].pop("_p")}}

    ours = RADMMMFlow(**{k: v for k, v in kw.items()
                         if k != "context_lstm_norm"},
                      context_lstm_norm=None)
    sl = SeqLens.create(jnp.asarray(lens), T)
    variables = {"params": params, "buffers": buffers}
    out = ours.apply(variables, jnp.asarray(mel), jnp.asarray(spk),
                     jnp.asarray(ctx), sl, jnp.asarray(f0),
                     jnp.asarray(energy), jnp.asarray(acc), train=False)

    # ---- reference forward --------------------------------------------
    seq = ref_common.SequenceLength(torch.from_numpy(lens.astype(np.int64)))
    with torch.no_grad():
        ref_out = ref(torch.from_numpy(mel.transpose(0, 2, 1)),
                      torch.from_numpy(spk),
                      torch.from_numpy(ctx.transpose(0, 2, 1)), seq,
                      f0=torch.from_numpy(f0),
                      energy_avg=torch.from_numpy(energy),
                      accent_vecs=torch.from_numpy(acc))

    want_z = ref_out["z_mel"].numpy().transpose(0, 2, 1)   # (B, T//2, 16)
    got_z = np.asarray(out["z_mel"])
    glens = lens // 2
    for b in range(B):
        np.testing.assert_allclose(got_z[b, :glens[b]], want_z[b, :glens[b]],
                                   atol=5e-4, err_msg=f"z item {b}")
    for i in range(3):
        np.testing.assert_allclose(float(out["log_det_W_list"][i]),
                                   float(ref_out["log_det_W_list"][i]),
                                   atol=1e-4, err_msg=f"logdet {i}")
        want_ls = ref_out["log_s_list"][i].numpy().transpose(0, 2, 1)
        got_ls = np.asarray(out["log_s_list"][i])
        for b in range(B):
            np.testing.assert_allclose(got_ls[b, :glens[b]],
                                       want_ls[b, :glens[b]], atol=5e-4,
                                       err_msg=f"log_s {i} item {b}")

    # ---- loss parity ---------------------------------------------------
    glens_sl = sl.downsample(2)
    n_elements = float(glens.sum())
    got_loss, got_prior = compute_flow_loss(
        out["z_mel"], out["log_det_W_list"], out["log_s_list"],
        n_elements, got_z.shape[-1], glens_sl.fmask(), 1.0)
    mask_t = ref_common.get_mask_from_lengths(
        torch.from_numpy(glens.astype(np.int64)))[:, None].float()
    # zero our padded z the way the reference's collate guarantees
    z_ref = ref_out["z_mel"] * mask_t
    log_s_ref = [ls * mask_t for ls in ref_out["log_s_list"]]
    want_loss, want_prior = ref_loss.compute_flow_loss(
        z_ref, ref_out["log_det_W_list"], log_s_ref,
        torch.tensor(n_elements), got_z.shape[-1], mask_t, 1.0)
    np.testing.assert_allclose(float(got_loss), float(want_loss), atol=1e-4)
    np.testing.assert_allclose(float(got_prior), float(want_prior),
                               atol=1e-4)
