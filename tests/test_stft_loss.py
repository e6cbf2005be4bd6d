"""Multi-resolution STFT loss vs torch.stft oracle."""
import jax.numpy as jnp
import numpy as np
import torch

from radmmm_tpu.losses.stft_loss import (stft_magnitude,
                                         spectral_convergence_loss,
                                         log_stft_magnitude_loss,
                                         MultiResolutionSTFTLoss)


def torch_mag(x, fft, hop, win):
    xs = torch.stft(torch.from_numpy(x), fft, hop, win,
                    torch.hann_window(win), return_complex=True)
    return torch.sqrt(torch.clamp(xs.abs() ** 2, min=1e-7)) \
        .transpose(2, 1).numpy()


def test_stft_magnitude_matches_torch(rng):
    x = rng.standard_normal((2, 4096)).astype(np.float32) * 0.2
    got = np.asarray(stft_magnitude(jnp.asarray(x), 1024, 120, 600))
    want = torch_mag(x, 1024, 120, 600)
    # torch.stft center-pads to the same frame count
    n = min(got.shape[1], want.shape[1])
    np.testing.assert_allclose(got[:, :n], want[:, :n], atol=2e-3)


def test_losses_zero_for_identical(rng):
    x = rng.standard_normal((2, 2048)).astype(np.float32)
    m = stft_magnitude(jnp.asarray(x), 512, 128, 512)
    assert float(spectral_convergence_loss(m, m)) == 0.0
    assert float(log_stft_magnitude_loss(m, m)) == 0.0


def test_multires_loss_runs_masked(rng):
    x = rng.standard_normal((2, 4096)).astype(np.float32) * 0.1
    y = x + rng.standard_normal((2, 4096)).astype(np.float32) * 0.02
    loss_fn = MultiResolutionSTFTLoss(fft_sizes=(512, 1024),
                                      hop_sizes=(128, 256),
                                      win_lengths=(512, 1024))
    ratios = jnp.asarray([1.0, 0.5])
    sc, mag = loss_fn(jnp.asarray(x), jnp.asarray(y), ratios)
    assert 0 < float(sc) < 1.0
    assert 0 < float(mag)
    sc2, mag2 = loss_fn(jnp.asarray(x), jnp.asarray(y))
    assert np.isfinite(float(sc2)) and np.isfinite(float(mag2))


def test_complex_mrstft_loss(rng):
    """Complex error-vector variant (stft_loss.py:316-363): identical
    signals floor the loss; divergence increases it monotonically; grads
    are finite."""
    import jax
    from radmmm_tpu.losses.stft_loss import MultiResolutionComplexSTFTLoss
    loss_fn = MultiResolutionComplexSTFTLoss()
    y = (rng.standard_normal((2, 4096)) * 0.3).astype(np.float32)
    n = (rng.standard_normal((2, 4096)) * 0.3).astype(np.float32)
    base = float(loss_fn(jnp.asarray(y), jnp.asarray(y)))
    small = float(loss_fn(jnp.asarray(y + 0.01 * n), jnp.asarray(y)))
    big = float(loss_fn(jnp.asarray(y + 0.3 * n), jnp.asarray(y)))
    assert base < small < big
    g = jax.grad(lambda x: loss_fn(x, jnp.asarray(y)))(jnp.asarray(y + n))
    assert np.isfinite(np.asarray(g)).all()
