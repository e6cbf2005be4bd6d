"""Pallas LSTM recurrence kernel vs the lax.scan implementation."""
import jax.numpy as jnp
import numpy as np

from radmmm_tpu.ops.lstm import lstm_scan
from radmmm_tpu.ops.lstm_pallas import lstm_recurrence_pallas


def test_pallas_lstm_matches_scan(rng):
    T, B, H, C = 23, 4, 8, 6
    x = rng.standard_normal((B, T, C)).astype(np.float32)
    mask = (np.arange(T)[None, :] < np.array([[23], [17], [9], [5]])
            ).astype(np.float32)
    wi = (rng.standard_normal((C, 4 * H)) * 0.2).astype(np.float32)
    wh = (rng.standard_normal((H, 4 * H)) * 0.2).astype(np.float32)
    b = (rng.standard_normal((4 * H,)) * 0.1).astype(np.float32)

    want = np.asarray(lstm_scan(jnp.asarray(x), jnp.asarray(mask), wi, wh, b))

    x_proj = np.einsum("btc,ch->bth", x, wi) + b
    got = np.asarray(lstm_recurrence_pallas(
        jnp.asarray(np.swapaxes(x_proj, 0, 1)),
        jnp.asarray(mask.T), jnp.asarray(wh), chunk=8, interpret=True))
    got = np.swapaxes(got, 0, 1)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_pallas_lstm_chunk_padding(rng):
    """T not a multiple of chunk: padded frames must not affect outputs."""
    T, B, H = 10, 2, 4
    x_proj = (rng.standard_normal((T, B, 4 * H)) * 0.3).astype(np.float32)
    mask = np.ones((T, B), np.float32)
    wh = (rng.standard_normal((H, 4 * H)) * 0.2).astype(np.float32)
    a = np.asarray(lstm_recurrence_pallas(
        jnp.asarray(x_proj), jnp.asarray(mask), jnp.asarray(wh),
        chunk=4, interpret=True))
    b = np.asarray(lstm_recurrence_pallas(
        jnp.asarray(x_proj), jnp.asarray(mask), jnp.asarray(wh),
        chunk=10, interpret=True))
    np.testing.assert_allclose(a, b, atol=1e-6)
    assert a.shape == (T, B, H)


def test_lstm_backend_flag_dispatch(rng):
    """set_lstm_backend('pallas_interpret') routes MaskedLSTM through the
    Pallas recurrence kernel with identical outputs (product integration of
    the kernel, not a shelf test)."""
    from radmmm_tpu.ops.lstm import set_lstm_backend, lstm_scan
    B, T, C, H = 2, 12, 6, 8
    x = (rng.standard_normal((B, T, C)) * 0.3).astype(np.float32)
    mask = np.ones((B, T), np.float32)
    mask[1, 9:] = 0
    wi = (rng.standard_normal((C, 4 * H)) * 0.2).astype(np.float32)
    wh = (rng.standard_normal((H, 4 * H)) * 0.2).astype(np.float32)
    b = np.zeros((4 * H,), np.float32)
    args = (jnp.asarray(x), jnp.asarray(mask), jnp.asarray(wi),
            jnp.asarray(wh), jnp.asarray(b))
    want = np.asarray(lstm_scan(*args))
    try:
        set_lstm_backend("pallas_interpret")
        got = np.asarray(lstm_scan(*args))
        got_rev = np.asarray(lstm_scan(*args, reverse=True))
    finally:
        set_lstm_backend("scan")
    want_rev = np.asarray(lstm_scan(*args, reverse=True))
    np.testing.assert_allclose(got, want, atol=1e-5)
    np.testing.assert_allclose(got_rev, want_rev, atol=1e-5)
