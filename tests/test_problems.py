"""Problem-definition oracles: linear analytic posterior + scatterometry."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dmip_tpu.problems import LinearForwardProblem, scatterometry as scat
from dmip_tpu.sde import VPSDE


@pytest.fixture(scope="module")
def prob():
    return LinearForwardProblem()


def test_forward_affine(prob):
    x = jnp.array([[1.0, 2.0], [0.0, 0.0]])
    y = prob.forward(x)
    np.testing.assert_allclose(y[0], [1 + 1 + 0.3, 2 + 0.5], rtol=1e-6)
    np.testing.assert_allclose(y[1], [0.3, 0.5], rtol=1e-6)


def test_posterior_moments_match_bayes_lls(prob):
    """Posterior from the reference's formula must equal the textbook
    Gaussian conditioning result (J = A^T S^-1 A + I)."""
    y = jnp.array([0.7, -0.4])
    mean, cov = prob.posterior_moments(y)
    A, b = np.asarray(prob.A), np.asarray(prob.b)
    S_inv = np.linalg.inv(np.asarray(prob.Sigma))
    J = A.T @ S_inv @ A + np.eye(2)
    cov_direct = np.linalg.inv(J)
    mean_direct = cov_direct @ A.T @ S_inv @ (np.asarray(y) - b)
    np.testing.assert_allclose(cov, cov_direct, atol=1e-5)
    np.testing.assert_allclose(mean, mean_direct, atol=1e-5)


def test_score_posterior_is_grad_log_posterior(prob):
    """Analytic score == autodiff gradient of the true log density."""
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (5, 2))
    y = jnp.array([0.7, -0.4])

    def logp(xi):
        return prob.posterior_log_prob(xi[None], y)[0]

    grad = jax.vmap(jax.grad(logp))(x)
    ys = jnp.broadcast_to(y, (5, 2))
    np.testing.assert_allclose(prob.score_posterior(x, ys), grad, atol=1e-4)


def test_log_posterior_quadratic_matches_true_up_to_constant(prob):
    key = jax.random.PRNGKey(1)
    x = jax.random.normal(key, (6, 2))
    y = jnp.array([0.2, 0.9])
    ys = jnp.broadcast_to(y, (6, 2))
    q = prob.log_posterior(x, ys)[:, 0]  # +1/2 (x-m)^T C^-1 (x-m)
    lp = prob.posterior_log_prob(x, y)  # normalized log density
    # q should equal -(lp - const): check q + lp is constant across x
    s = np.asarray(q) + np.asarray(lp)
    np.testing.assert_allclose(s, s[0], atol=1e-4)


def test_sample_posterior_moments(prob, key):
    y = jnp.array([1.0, 0.0])
    xs = prob.sample_posterior(key, y, 200_000)
    mean, cov = prob.posterior_moments(y)
    np.testing.assert_allclose(np.mean(np.asarray(xs), 0), mean, atol=0.01)
    np.testing.assert_allclose(np.cov(np.asarray(xs).T), cov, atol=0.01)


def test_diffused_posterior_score_limits(prob):
    """t -> 0 recovers the posterior score; t -> 1 approaches -x (prior N(0,I))."""
    sde = VPSDE()
    key = jax.random.PRNGKey(2)
    x = jax.random.normal(key, (4, 2))
    y = jnp.array([0.7, -0.4])
    ys = jnp.broadcast_to(y, (4, 2))
    s0 = prob.diffused_posterior_score(sde, x, y, jnp.asarray(1e-5))
    np.testing.assert_allclose(s0, prob.score_posterior(x, ys), atol=1e-3)
    s1 = prob.diffused_posterior_score(sde, x, y, jnp.asarray(1.0))
    np.testing.assert_allclose(s1, -x, atol=0.05)


# -- scatterometry ----------------------------------------------------------


def test_surrogate_loads_and_shapes():
    fwd, params = scat.load_forward_model()
    x = jnp.zeros((4, 3))
    y = fwd(x)
    assert y.shape == (4, 23)
    assert params["xdim"] == 3 and params["ydim"] == 23


def test_surrogate_matches_torch_reference_weights():
    """Our pure-JAX apply of the converted weights must equal the torch
    forward pass of the original checkpoint."""
    import torch

    fwd, _ = scat.load_forward_model()
    state = torch.load(
        "/root/reference/trained_models/scatterometry/surrogate.pt",
        map_location="cpu",
    )
    net = torch.nn.Sequential(
        torch.nn.Linear(3, 256), torch.nn.ReLU(),
        torch.nn.Linear(256, 256), torch.nn.ReLU(),
        torch.nn.Linear(256, 256), torch.nn.ReLU(),
        torch.nn.Linear(256, 23),
    )
    net.load_state_dict(state)
    x = np.random.default_rng(0).uniform(-1, 1, (16, 3)).astype(np.float32)
    with torch.no_grad():
        y_torch = net(torch.tensor(x)).numpy()
    y_jax = np.asarray(fwd(jnp.asarray(x)))
    np.testing.assert_allclose(y_jax, y_torch, rtol=2e-4, atol=1e-5)


def test_log_posterior_energy_formula():
    fwd, p = scat.load_forward_model()
    x = jnp.array([[0.1, -0.2, 0.3], [1.5, 0.0, 0.0]])
    ys = fwd(x[:1]).repeat(2, axis=0)
    e = scat.get_log_posterior(x, fwd, p["a"], p["b"], ys, p["lambd_bd"])
    assert e.shape == (2,)
    # boundary loss kicks in for |x| > 1
    assert float(e[1]) > float(e[0]) + 100.0


def test_inverse_cdf_prior_distribution(key):
    """Samples must concentrate on [-1,1] with ~lambd_bd-scale tails and be
    approximately uniform inside."""
    lambd = 1000.0
    u = jax.random.uniform(key, (200_000,))
    x = np.asarray(scat.inverse_cdf_prior(u, lambd))
    inside = np.mean((x >= -1) & (x <= 1))
    np.testing.assert_allclose(inside, lambd / (lambd + 1), atol=0.002)
    # uniformity inside: mean ~ 0, var ~ 1/3
    xi = x[(x >= -1) & (x <= 1)]
    np.testing.assert_allclose(np.mean(xi), 0.0, atol=0.01)
    np.testing.assert_allclose(np.var(xi), 1 / 3, atol=0.01)


def test_inverse_cdf_prior_matches_reference_numpy(rng):
    """Branchless jnp version vs a straightforward numpy transcription of the
    reference's piecewise formula (utils_scatterometry.py:43-52)."""
    lambd = 1000.0
    u = rng.uniform(size=(10_000,)).astype(np.float32)

    v = u * (2 * lambd + 2) / lambd
    y = np.zeros_like(v)
    left = v < 1 / lambd
    y[left] = np.log(v[left] * lambd) - 1
    middle = (v >= 1 / lambd) & (v < 2 + 1 / lambd)
    y[middle] = v[middle] - 1 / lambd - 1
    right = v >= 2 + 1 / lambd
    y[right] = -np.log(((2 + 2 / lambd) - v[right]) * lambd) + 1

    ours = np.asarray(scat.inverse_cdf_prior(jnp.asarray(u), lambd))
    np.testing.assert_allclose(ours, y, rtol=1e-4, atol=1e-5)


def test_score_posterior_scatterometry_is_neg_energy_grad():
    fwd, p = scat.load_forward_model()
    score_fn = scat.score_posterior(fwd, p["a"], p["b"], p["lambd_bd"])
    x = jnp.array([[0.1, -0.2, 0.3]])
    ys = fwd(x)
    s = score_fn(x, ys)
    h = 1e-3
    for d in range(3):
        dx = jnp.zeros((1, 3)).at[0, d].set(h)
        e_plus = scat.get_log_posterior(x + dx, fwd, p["a"], p["b"], ys, p["lambd_bd"])
        e_minus = scat.get_log_posterior(x - dx, fwd, p["a"], p["b"], ys, p["lambd_bd"])
        fd = -(e_plus - e_minus) / (2 * h)
        np.testing.assert_allclose(s[0, d], fd[0], rtol=0.05, atol=1e-3)


def test_diffused_joint_score_matches_autodiff(prob, key):
    """The joint-diffusion oracle equals grad_z log N(z; alpha m_z,
    alpha^2 C_z + sigma^2 I) computed by autodiff."""
    from dmip_tpu.sde import VPSDE

    sde = VPSDE()
    mz, Cz = prob.joint_moments()
    z = jax.random.normal(key, (5, 4))
    t = jnp.full((5, 1), 0.37)

    s_oracle = prob.diffused_joint_score(sde, z, t)

    def logp(zi):
        alpha = sde.mean_weight(jnp.asarray(0.37))
        cov = alpha**2 * Cz + sde.var(jnp.asarray(0.37)) * jnp.eye(4)
        return jax.scipy.stats.multivariate_normal.logpdf(zi, alpha * mz, cov)

    s_auto = jax.vmap(jax.grad(logp))(z)
    np.testing.assert_allclose(np.asarray(s_oracle), np.asarray(s_auto),
                               rtol=1e-4, atol=1e-5)


def test_joint_moments_match_empirical(prob, key):
    """m_z / C_z agree with the empirical joint moments of simulated data."""
    k1, k2 = jax.random.split(key)
    x = jax.random.normal(k1, (200_000, 2))
    y = prob.forward(x) + prob.noise_std * jax.random.normal(k2, (200_000, 2))
    z = jnp.concatenate([x, y], axis=1)
    mz, Cz = prob.joint_moments()
    np.testing.assert_allclose(np.asarray(z.mean(0)), np.asarray(mz),
                               atol=0.02)
    np.testing.assert_allclose(np.asarray(jnp.cov(z.T)), np.asarray(Cz),
                               atol=0.03)
