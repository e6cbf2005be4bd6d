"""Masked scan-LSTM parity vs torch packed-sequence LSTM with copied weights."""
import jax
import jax.numpy as jnp
import numpy as np
import torch

from radmmm_tpu.ops.lstm import MaskedLSTM, lstm_scan
from radmmm_tpu.utils.masking import SeqLens


def copy_params_to_torch(params, lstm, hidden, bidirectional):
    p = params["params"]
    with torch.no_grad():
        lstm.weight_ih_l0.copy_(torch.from_numpy(np.asarray(p["wi_fwd"]).T))
        lstm.weight_hh_l0.copy_(torch.from_numpy(np.asarray(p["wh_fwd"]).T))
        lstm.bias_ih_l0.copy_(torch.from_numpy(np.asarray(p["b_ih_fwd"])))
        lstm.bias_hh_l0.copy_(torch.from_numpy(np.asarray(p["b_hh_fwd"])))
        if bidirectional:
            lstm.weight_ih_l0_reverse.copy_(torch.from_numpy(np.asarray(p["wi_bwd"]).T))
            lstm.weight_hh_l0_reverse.copy_(torch.from_numpy(np.asarray(p["wh_bwd"]).T))
            lstm.bias_ih_l0_reverse.copy_(torch.from_numpy(np.asarray(p["b_ih_bwd"])))
            lstm.bias_hh_l0_reverse.copy_(torch.from_numpy(np.asarray(p["b_hh_bwd"])))


def run_torch_packed(x, lens, lstm):
    xt = torch.from_numpy(x)
    packed = torch.nn.utils.rnn.pack_padded_sequence(
        xt, torch.from_numpy(lens).long(), batch_first=True,
        enforce_sorted=False)
    out, _ = lstm(packed)
    out, _ = torch.nn.utils.rnn.pad_packed_sequence(
        out, batch_first=True, total_length=x.shape[1])
    return out.detach().numpy()


def test_bilstm_matches_torch_packed(rng):
    B, T, C, H = 3, 13, 6, 4
    x = rng.standard_normal((B, T, C)).astype(np.float32)
    lens = np.array([13, 9, 5], dtype=np.int32)
    sl = SeqLens.create(jnp.asarray(lens), T)
    mod = MaskedLSTM(hidden=H, bidirectional=True)
    params = mod.init(jax.random.key(0), jnp.asarray(x), sl.mask)
    got = np.asarray(mod.apply(params, jnp.asarray(x), sl.mask))

    lstm = torch.nn.LSTM(C, H, 1, batch_first=True, bidirectional=True)
    copy_params_to_torch(params, lstm, H, True)
    want = run_torch_packed(x, lens, lstm)
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_unidirectional_lstm_matches_torch(rng):
    B, T, C, H = 2, 9, 5, 7
    x = rng.standard_normal((B, T, C)).astype(np.float32)
    lens = np.array([9, 4], dtype=np.int32)
    sl = SeqLens.create(jnp.asarray(lens), T)
    mod = MaskedLSTM(hidden=H, bidirectional=False)
    params = mod.init(jax.random.key(1), jnp.asarray(x), sl.mask)
    got = np.asarray(mod.apply(params, jnp.asarray(x), sl.mask))
    lstm = torch.nn.LSTM(C, H, 1, batch_first=True, bidirectional=False)
    copy_params_to_torch(params, lstm, H, False)
    want = run_torch_packed(x, lens, lstm)
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_spectral_norm_scales_recurrent_weight(rng):
    """Spectrally-normalized wh must have sigma==1 after division; u updates."""
    B, T, C, H = 2, 6, 4, 4
    x = rng.standard_normal((B, T, C)).astype(np.float32)
    sl = SeqLens.create(jnp.asarray(np.array([6, 6], np.int32)), T)
    mod = MaskedLSTM(hidden=H, bidirectional=True, spectral_norm=True)
    variables = mod.init(jax.random.key(2), jnp.asarray(x), sl.mask)
    out, mut = mod.apply(variables, jnp.asarray(x), sl.mask, True,
                         mutable=["spectral"])
    assert out.shape == (B, T, 2 * H)
    # iterated u converges toward the top singular vector; after many updates
    # sigma(wh / sigma) -> 1
    wh = np.asarray(variables["params"]["wh_fwd"]).T
    u = np.asarray(mut["spectral"]["SpectralNormedParam_0"]["wh_fwd_u"])
    for _ in range(50):
        v = wh.T @ u; v /= np.linalg.norm(v)
        u = wh @ v; u /= np.linalg.norm(u)
    sigma = u @ wh @ v
    np.testing.assert_allclose(sigma, np.linalg.svd(wh)[1][0], rtol=1e-4)


def test_lstm_scan_reverse_consistency(rng):
    """Reversing input+output == running the reverse direction on full lens."""
    B, T, C, H = 2, 8, 3, 5
    x = rng.standard_normal((B, T, C)).astype(np.float32)
    m = np.ones((B, T), np.float32)
    wi = rng.standard_normal((C, 4 * H)).astype(np.float32) * 0.1
    wh = rng.standard_normal((H, 4 * H)).astype(np.float32) * 0.1
    b = rng.standard_normal((4 * H,)).astype(np.float32) * 0.1
    fwd_on_flipped = np.asarray(lstm_scan(
        jnp.asarray(x[:, ::-1].copy()), jnp.asarray(m), wi, wh, b))[:, ::-1]
    bwd = np.asarray(lstm_scan(jnp.asarray(x), jnp.asarray(m), wi, wh, b,
                               reverse=True))
    np.testing.assert_allclose(fwd_on_flipped, bwd, atol=1e-6)

def test_fused_bilstm_matches_two_scans(rng):
    """bilstm_scan (one direction-stacked scan) == two lstm_scan calls,
    on ragged lengths."""
    from radmmm_tpu.ops.lstm import bilstm_scan
    B, T, C, H = 3, 11, 4, 6
    x = rng.standard_normal((B, T, C)).astype(np.float32)
    lens = np.array([11, 7, 1])
    m = (np.arange(T)[None, :] < lens[:, None]).astype(np.float32)
    w = [rng.standard_normal(s).astype(np.float32) * 0.1
         for s in [(C, 4 * H), (H, 4 * H), (4 * H,)] * 2]
    out_f, out_b = bilstm_scan(jnp.asarray(x), jnp.asarray(m), *w)
    ref_f = lstm_scan(jnp.asarray(x), jnp.asarray(m), *w[:3])
    ref_b = lstm_scan(jnp.asarray(x), jnp.asarray(m), *w[3:], reverse=True)
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(ref_f), atol=1e-6)
    np.testing.assert_allclose(np.asarray(out_b), np.asarray(ref_b), atol=1e-6)

def test_multi_bilstm_matches_separate_bilstms(rng):
    """multi_bilstm_scan (P lane-stacked BiLSTMs in one scan) == P separate
    bilstm_scan calls, on ragged lengths."""
    from radmmm_tpu.ops.lstm import bilstm_scan, multi_bilstm_scan
    P, B, T, C, H = 3, 2, 9, 4, 5
    xs = rng.standard_normal((P, B, T, C)).astype(np.float32)
    lens = np.array([9, 4])
    m = (np.arange(T)[None, :] < lens[:, None]).astype(np.float32)
    ws = [[rng.standard_normal(s).astype(np.float32) * 0.1
           for s in [(C, 4 * H), (H, 4 * H), (4 * H,)] * 2]
          for _ in range(P)]
    out = multi_bilstm_scan(
        jnp.asarray(xs), jnp.asarray(m),
        jnp.stack([np.concatenate([w[0], w[3]], axis=1) for w in ws]),
        jnp.stack([np.stack([w[1], w[4]]) for w in ws]),
        jnp.stack([np.stack([w[2], w[5]]) for w in ws]))
    for p in range(P):
        rf, rb = bilstm_scan(jnp.asarray(xs[p]), jnp.asarray(m), *ws[p])
        ref = np.concatenate([np.asarray(rf), np.asarray(rb)], axis=-1)
        np.testing.assert_allclose(np.asarray(out[p]), ref, atol=1e-6)
