"""MAS, length regulator, ConvAttention, CTC — parity vs oracles."""
import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from radmmm_tpu.ops.alignment import mas_width1, mas_width1_ref, binarize_attention
from radmmm_tpu.ops.attention import ConvAttention
from radmmm_tpu.ops.length_regulator import regulate_length
from radmmm_tpu.losses.ctc import attention_ctc_loss


def soft_attn(rng, B, T_mel, T_text):
    """Plausible soft attention: noisy diagonal, normalized over text."""
    a = rng.uniform(0.01, 1.0, (B, T_mel, T_text)).astype(np.float32)
    for b in range(B):
        for i in range(T_mel):
            j = int(i * T_text / T_mel)
            a[b, i, j] += 3.0
    return a / a.sum(-1, keepdims=True)


def test_mas_matches_reference_oracle(rng):
    B, T_mel, T_text = 3, 37, 11
    attn = soft_attn(rng, B, T_mel, T_text)
    text_lens = np.array([11, 7, 5], np.int32)
    mel_lens = np.array([37, 25, 12], np.int32)
    got = np.asarray(mas_width1(jnp.asarray(attn), jnp.asarray(text_lens),
                                jnp.asarray(mel_lens)))
    for b in range(B):
        want = mas_width1_ref(attn[b, :mel_lens[b], :text_lens[b]])
        np.testing.assert_array_equal(got[b, :mel_lens[b], :text_lens[b]],
                                      want, err_msg=f"item {b}")
        assert got[b, mel_lens[b]:, :].sum() == 0
        assert got[b, :, text_lens[b]:].sum() == 0


def test_mas_ties_prefer_diagonal():
    """Uniform attention: the tie-break must match the reference exactly."""
    T_mel, T_text = 9, 4
    attn = np.full((1, T_mel, T_text), 0.25, np.float32)
    got = np.asarray(mas_width1(jnp.asarray(attn), jnp.asarray([T_text]),
                                jnp.asarray([T_mel])))
    want = mas_width1_ref(attn[0])
    np.testing.assert_array_equal(got[0], want)


def test_mas_properties(rng):
    attn = soft_attn(rng, 2, 50, 13)
    lens_t, lens_m = np.array([13, 9]), np.array([50, 44])
    opt = np.asarray(mas_width1(jnp.asarray(attn), jnp.asarray(lens_t),
                                jnp.asarray(lens_m)))
    for b in range(2):
        v = opt[b, :lens_m[b], :lens_t[b]]
        # one token per mel frame
        np.testing.assert_array_equal(v.sum(-1), 1.0)
        path = v.argmax(-1)
        # monotone, steps of 0/1, full coverage
        d = np.diff(path)
        assert ((d == 0) | (d == 1)).all()
        assert path[0] == 0 and path[-1] == lens_t[b] - 1


def test_binarize_attention_detached(rng):
    """Default (reference training_step) semantics: fully detached hard
    attention — zero gradient through binarize_attention itself."""
    attn = jnp.asarray(soft_attn(rng, 1, 20, 6))

    def f(a):
        hard = binarize_attention(a, jnp.asarray([6]), jnp.asarray([20]))
        return (hard * jax.lax.stop_gradient(a)).sum()

    g = jax.grad(f)(attn)
    np.testing.assert_array_equal(np.asarray(g), 0.0)
    hard = binarize_attention(attn, jnp.asarray([6]), jnp.asarray([20]))
    assert set(np.unique(np.round(np.asarray(hard), 6))) <= {0.0, 1.0}


def test_binarize_attention_straight_through(rng):
    attn = jnp.asarray(soft_attn(rng, 1, 20, 6))

    def f(a):
        hard = binarize_attention(a, jnp.asarray([6]), jnp.asarray([20]),
                                  straight_through=True)
        return (hard * a).sum()

    g = jax.grad(f)(attn)   # gradient flows through the soft path only
    assert np.isfinite(np.asarray(g)).all()
    assert np.abs(np.asarray(g)).max() > 0
    hard = binarize_attention(attn, jnp.asarray([6]), jnp.asarray([20]),
                              straight_through=True)
    assert set(np.unique(np.round(np.asarray(hard), 6))) <= {0.0, 1.0}


def test_length_regulator_matches_loop(rng):
    B, T_text, C = 2, 5, 3
    x = rng.standard_normal((B, T_text, C)).astype(np.float32)
    dur = np.array([[2, 0, 3, 1, 2], [1, 1, 1, 0, 0]], np.int32)
    out, out_lens = regulate_length(jnp.asarray(x), jnp.asarray(dur), 10)
    np.testing.assert_array_equal(np.asarray(out_lens), [8, 3])
    for b in range(B):
        want = np.concatenate([np.repeat(x[b, i:i+1], dur[b, i], axis=0)
                               for i in range(T_text)], axis=0)
        np.testing.assert_allclose(np.asarray(out)[b, :want.shape[0]], want)
        assert np.abs(np.asarray(out)[b, want.shape[0]:]).sum() == 0


def test_conv_attention_shapes_and_prior(rng):
    B, T_mel, T_text = 2, 30, 9
    mel = jnp.asarray(rng.standard_normal((B, T_mel, 80)).astype(np.float32))
    keys = jnp.asarray(rng.standard_normal((B, T_text, 512)).astype(np.float32))
    prior = jnp.asarray(soft_attn(rng, B, T_mel, T_text))
    key_mask = jnp.asarray(np.arange(T_text)[None] < np.array([[9], [6]]))
    att = ConvAttention()
    p = att.init(jax.random.key(0), mel, keys, key_mask, prior)
    attn, attn_logprob = att.apply(p, mel, keys, key_mask, prior)
    assert attn.shape == (B, T_mel, T_text)
    np.testing.assert_allclose(np.asarray(attn.sum(-1)), 1.0, atol=1e-5)
    # masked key positions get zero attention
    assert np.asarray(attn)[1, :, 6:].sum() == 0
    # logprob reflects the prior: higher prior -> higher logprob on average
    assert np.isfinite(np.asarray(attn_logprob)).all()


def torch_ctc_oracle(attn_logprob, text_lens, mel_lens, blank_logprob=-1.0):
    """Reference procedure (loss.py:119-141) built with torch primitives."""
    B = attn_logprob.shape[0]
    a = torch.from_numpy(attn_logprob)  # (B, T_mel, T_text)
    a = F.pad(a, (1, 0), value=blank_logprob)
    total = 0.0
    ctc = torch.nn.CTCLoss(zero_infinity=True)
    for b in range(B):
        S, T = int(text_lens[b]), int(mel_lens[b])
        target = torch.arange(1, S + 1)[None]
        curr = a[b, :T, :S + 1][:, None]          # (T, 1, S+1)
        curr = F.log_softmax(curr, dim=2)
        total = total + ctc(curr, target, torch.tensor([T]), torch.tensor([S]))
    return float(total / B)


def test_ctc_matches_torch(rng):
    B, T_mel, T_text = 3, 24, 7
    logits = rng.standard_normal((B, T_mel, T_text)).astype(np.float32)
    text_lens = np.array([7, 5, 3], np.int64)
    mel_lens = np.array([24, 20, 10], np.int64)
    got = float(attention_ctc_loss(jnp.asarray(logits),
                                   jnp.asarray(text_lens.astype(np.int32)),
                                   jnp.asarray(mel_lens.astype(np.int32))))
    want = torch_ctc_oracle(logits, text_lens, mel_lens)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_ctc_gradient_finite(rng):
    logits = jnp.asarray(
        rng.standard_normal((2, 16, 5)).astype(np.float32))
    g = jax.grad(lambda a: attention_ctc_loss(
        a, jnp.asarray([5, 3]), jnp.asarray([16, 12])))(logits)
    assert np.isfinite(np.asarray(g)).all()


def test_ctc_custom_vjp_matches_autodiff(rng):
    """The alpha-beta posterior backward (custom_vjp) must agree with
    plain autodiff through the forward scan, on ragged lengths and with
    a non-unit upstream cotangent."""
    from radmmm_tpu.losses.ctc import attention_ctc_loss_autodiff
    B, T_mel, T_text = 4, 28, 9
    logits = jnp.asarray(
        rng.standard_normal((B, T_mel, T_text)).astype(np.float32) * 2)
    tl = jnp.asarray([9, 6, 2, 1], jnp.int32)
    ml = jnp.asarray([28, 19, 8, 3], jnp.int32)
    v1 = float(attention_ctc_loss(logits, tl, ml))
    v2 = float(attention_ctc_loss_autodiff(logits, tl, ml))
    np.testing.assert_allclose(v1, v2, rtol=1e-6)
    g1 = jax.grad(lambda a: 3.0 * attention_ctc_loss(a, tl, ml))(logits)
    g2 = jax.grad(lambda a: 3.0 * attention_ctc_loss_autodiff(
        a, tl, ml))(logits)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               rtol=1e-4, atol=3e-6)
    # masked regions get exactly zero gradient
    g1 = np.asarray(g1)
    assert np.abs(g1[1, 19:, :]).max() == 0.0
    assert np.abs(g1[1, :, 6:]).max() == 0.0


def test_mas_degenerate_lengths(rng):
    """text_len=1 and mel_len=1 items must produce valid alignments."""
    attn = soft_attn(rng, 3, 10, 5)
    text_lens = np.array([1, 5, 3], np.int32)
    mel_lens = np.array([10, 1, 3], np.int32)
    opt = np.asarray(mas_width1(jnp.asarray(attn), jnp.asarray(text_lens),
                                jnp.asarray(mel_lens)))
    # item 0: all mel frames on the single token
    np.testing.assert_array_equal(opt[0, :10, 0], 1.0)
    assert opt[0, :, 1:].sum() == 0
    # item 1: single mel frame on the last... reference puts it at token
    # text_len-1 then the trailing write also marks token 0
    want = mas_width1_ref(attn[1, :1, :5])
    np.testing.assert_array_equal(opt[1, :1, :5], want)
    # item 2 matches oracle
    want2 = mas_width1_ref(attn[2, :3, :3])
    np.testing.assert_array_equal(opt[2, :3, :3], want2)


def test_ctc_degenerate_lengths(rng):
    logits = rng.standard_normal((2, 8, 4)).astype(np.float32)
    loss = float(attention_ctc_loss(jnp.asarray(logits),
                                    jnp.asarray([1, 4]),
                                    jnp.asarray([8, 2])))
    want = torch_ctc_oracle(logits, np.array([1, 4]), np.array([8, 2]))
    np.testing.assert_allclose(loss, want, rtol=1e-4, atol=1e-5)


def test_length_regulator_zero_total(rng):
    x = jnp.asarray(rng.standard_normal((1, 3, 2)).astype(np.float32))
    out, lens = regulate_length(x, jnp.zeros((1, 3), jnp.int32), 4)
    assert int(lens[0]) == 0
    assert np.abs(np.asarray(out)).sum() == 0


def test_mas_pallas_kernel_matches_scan(rng):
    """The single-kernel Pallas MAS (VMEM-resident DP + backtrack) agrees
    exactly with the scan path and the numpy oracle, incl. padded lanes,
    short lengths, and the tie-break (interpret mode on CPU)."""
    from radmmm_tpu.ops.alignment import set_mas_backend
    B, T_mel, T_text = 3, 40, 17
    attn = soft_attn(rng, B, T_mel, T_text)
    text_lens = np.array([17, 9, 1], np.int32)
    mel_lens = np.array([40, 23, 5], np.int32)
    args = (jnp.asarray(attn), jnp.asarray(text_lens), jnp.asarray(mel_lens))
    try:
        set_mas_backend("pallas")
        got = np.asarray(mas_width1(*args))
    finally:
        set_mas_backend("auto")
    want = np.asarray(mas_width1(*args))
    np.testing.assert_array_equal(got, want)
    for b in range(B):
        oracle = mas_width1_ref(attn[b, :mel_lens[b], :text_lens[b]])
        np.testing.assert_array_equal(
            got[b, :mel_lens[b], :text_lens[b]], oracle, err_msg=f"item {b}")

def test_ctc_pallas_matches_scan(rng):
    """Pallas alpha/beta DP kernels (interpret mode on CPU) == the lax.scan
    CTC path: loss and gradient, ragged text/mel lengths."""
    from radmmm_tpu.losses import ctc as ctc_mod
    B, T_mel, T_text = 3, 37, 11
    logits = jnp.asarray(
        rng.standard_normal((B, T_mel, T_text)).astype(np.float32))
    tl = jnp.asarray(np.array([11, 7, 1], np.int32))
    ml = jnp.asarray(np.array([37, 20, 3], np.int32))

    ctc_mod.set_ctc_backend("scan")
    try:
        v_scan = float(attention_ctc_loss(logits, tl, ml))
        g_scan = jax.grad(lambda a: attention_ctc_loss(a, tl, ml))(logits)
        ctc_mod.set_ctc_backend("pallas")
        v_pal = float(attention_ctc_loss(logits, tl, ml))
        g_pal = jax.grad(lambda a: attention_ctc_loss(a, tl, ml))(logits)
    finally:
        ctc_mod.set_ctc_backend("auto")
    np.testing.assert_allclose(v_pal, v_scan, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(g_pal), np.asarray(g_scan),
                               atol=1e-5)
