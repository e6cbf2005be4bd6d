"""Beta-binomial alignment prior parity vs scipy.stats.betabinom oracle."""
import numpy as np
from scipy.stats import betabinom

from radmmm_tpu.ops.priors import beta_binomial_prior


def scipy_prior(P, M, scale=0.05):
    """Reference formula (data.py:90-101) evaluated with scipy directly."""
    x = np.arange(0, P)
    rows = []
    for i in range(1, M + 1):
        a, b = scale * i, scale * (M + 1 - i)
        rows.append(betabinom(P - 1, a, b).pmf(x))
    return np.array(rows)


def test_prior_matches_scipy():
    P, M = 37, 143
    got = np.asarray(beta_binomial_prior(P, M, max_text=P, max_mel=M))
    # f32 gammaln chains limit us to ~1e-4 abs; the reference itself uses a far
    # coarser bilinear interpolation of this matrix (data.py:61-87).
    want = scipy_prior(P, M)
    np.testing.assert_allclose(got, want, atol=5e-4, rtol=5e-3)


def test_prior_batched_and_padded():
    got = np.asarray(beta_binomial_prior(
        np.array([10, 20]), np.array([50, 80]), max_text=32, max_mel=96))
    assert got.shape == (2, 96, 32)
    # padded regions zero
    assert got[0, 50:, :].sum() == 0 and got[0, :, 10:].sum() == 0
    assert got[1, 80:, :].sum() == 0 and got[1, :, 20:].sum() == 0
    # valid region matches scipy
    np.testing.assert_allclose(got[0, :50, :10], scipy_prior(10, 50),
                               atol=5e-4, rtol=5e-3)
    # each valid row is a distribution
    np.testing.assert_allclose(got[1, :80, :20].sum(-1), 1.0, atol=5e-4)
