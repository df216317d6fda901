"""VP-SDE closed forms + debiased t-sampler (reference sdes.py:9-57)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dmip_tpu.sde import ReverseSDE, VPSDE, sample_t


def test_closed_forms_match_reference_formulas():
    sde = VPSDE()
    t = jnp.linspace(0.01, 1.0, 17)
    bd = sde.beta_max - sde.beta_min
    np.testing.assert_allclose(sde.beta(t), 0.1 + (20.0 - 0.1) * t, rtol=1e-6)
    np.testing.assert_allclose(
        sde.mean_weight(t),
        np.exp(-0.25 * t**2 * bd - 0.5 * t * sde.beta_min),
        rtol=1e-5,
    )
    np.testing.assert_allclose(
        sde.var(t), 1.0 - np.exp(-0.5 * t**2 * bd - t * sde.beta_min),
        rtol=1e-3, atol=1e-6,
    )
    np.testing.assert_allclose(sde.g(t) ** 2, sde.beta(t), rtol=1e-6)
    y = jnp.ones((4, 2))
    np.testing.assert_allclose(
        sde.f(t[:4, None], y), -0.5 * sde.beta(t[:4, None]) * y, rtol=1e-6
    )


def test_var_equals_one_minus_alpha_sq():
    sde = VPSDE()
    t = jnp.linspace(0.0, 1.0, 11)
    np.testing.assert_allclose(sde.var(t), 1 - sde.mean_weight(t) ** 2, atol=1e-6)


def test_marginal_sample_moments(key):
    sde = VPSDE()
    t = jnp.full((200_000, 1), 0.5)
    y0 = jnp.ones((200_000, 2)) * 2.0
    yt, eps, std, g = sde.marginal_sample(key, t, y0)
    alpha = float(sde.mean_weight(0.5))
    var = float(sde.var(0.5))
    np.testing.assert_allclose(np.mean(np.asarray(yt), 0), 2.0 * alpha, atol=0.02)
    np.testing.assert_allclose(np.var(np.asarray(yt), 0), var, rtol=0.02)
    np.testing.assert_allclose(np.asarray(std) ** 2, var, rtol=1e-5)
    # reparametrized path reproduces the same sample
    np.testing.assert_allclose(sde.diffuse(t, y0, eps), yt, atol=1e-6)


def test_debiasing_t_distribution(key):
    """Empirical CDF of sampled t must match the analytic normalized CDF."""
    sde = VPSDE()
    n = 200_000
    ts = np.sort(np.asarray(sde.sample_debiasing_t(key, (n,))))
    q = lambda t: np.asarray(sde._Q(jnp.asarray(t)))
    lo, hi = q(sde.t_epsilon), q(sde.T)
    grid = np.linspace(0.002, 0.999, 50)
    cdf_analytic = (q(grid) - lo) / (hi - lo)
    cdf_empirical = np.searchsorted(ts, grid) / n
    np.testing.assert_allclose(cdf_empirical, cdf_analytic, atol=0.01)
    assert ts.min() >= sde.t_epsilon
    assert ts.max() <= sde.T


def test_sample_t_ranges(key):
    rsde = ReverseSDE(debias=True)
    t = sample_t(rsde, key, 10_000)
    assert t.shape == (10_000, 1)
    assert float(t.min()) >= rsde.base.t_epsilon
    assert float(t.max()) <= rsde.T
    rsde_u = ReverseSDE(debias=False)
    t = sample_t(rsde_u, key, 10_000)
    assert float(t.min()) >= 1e-4
    assert float(t.max()) <= rsde_u.T


def test_reverse_sde_drift_formula(key):
    """mu = g(T-t) a(x,cond,T-t) - f(T-t,x); sigma = g(T-t) at lmbd=0."""
    rsde = ReverseSDE()
    drift = lambda x, cond, s: 3.0 * x + s
    t = jnp.full((5, 1), 0.25)
    x = jax.random.normal(key, (5, 2))
    mu = rsde.mu(drift, t, x, None)
    s = rsde.T - t
    expected = rsde.base.g(s) * (3.0 * x + s) + 0.5 * rsde.base.beta(s) * x
    np.testing.assert_allclose(mu, expected, rtol=1e-5)
    np.testing.assert_allclose(rsde.sigma(t), rsde.base.g(s), rtol=1e-6)
    # lmbd scaling (reference sdes.py:77-87)
    mu_l = rsde.mu(drift, t, x, None, lmbd=0.5)
    expected_l = 0.75 * rsde.base.g(s) * (3.0 * x + s) + 0.5 * rsde.base.beta(s) * x
    np.testing.assert_allclose(mu_l, expected_l, rtol=1e-5)
    np.testing.assert_allclose(
        rsde.sigma(t, lmbd=0.5), np.sqrt(0.5) * rsde.base.g(s), rtol=1e-6
    )
