"""Euler-Maruyama sampler oracles.

The strongest test: drive the reverse SDE with the ANALYTIC diffused
posterior score of the linear problem (a 'perfect net') — the samples must
reproduce the analytic posterior moments.  This validates drift/diffusion
signs, the time grid, and noise scaling end-to-end without any training.
"""

import jax
import jax.numpy as jnp
import numpy as np

from dmip_tpu.problems import LinearForwardProblem
from dmip_tpu.samplers import euler_maruyama, euler_maruyama_cdiffe
from dmip_tpu.sde import ReverseSDE, VPSDE


def test_em_with_perfect_score_recovers_posterior(key):
    prob = LinearForwardProblem()
    sde = ReverseSDE()
    y = jnp.array([0.8, -0.3])

    def drift_a(x, cond, s):
        # net parametrization: a = g * score
        t = s[0, 0] if s.ndim > 0 else s
        score = prob.diffused_posterior_score(sde.base, x, y, t)
        return sde.base.g(t) * score

    x = euler_maruyama(sde, drift_a, key, y, num_samples=40_000, xdim=2,
                       num_steps=400)
    mean, cov = prob.posterior_moments(y)
    np.testing.assert_allclose(np.mean(np.asarray(x), 0), mean, atol=0.03)
    np.testing.assert_allclose(np.cov(np.asarray(x).T), cov, atol=0.04)


def test_em_unconditional_standard_normal(key):
    """With the prior score of N(0, I) (stationary), reverse diffusion from
    N(0,I) must return N(0,I)."""
    sde = ReverseSDE()

    def drift_a(x, cond, s):
        t = s[0, 0] if s.ndim > 0 else s
        return sde.base.g(t) * (-x)

    x = euler_maruyama(sde, drift_a, key, None, num_samples=40_000, xdim=2,
                       num_steps=200)
    np.testing.assert_allclose(np.mean(np.asarray(x), 0), 0.0, atol=0.03)
    np.testing.assert_allclose(np.cov(np.asarray(x).T), np.eye(2), atol=0.04)


def test_em_cdiffe_runs_and_is_finite(key):
    sde = ReverseSDE()

    def drift_a(z, cond, s):
        t = s[0, 0] if s.ndim > 0 else s
        return sde.base.g(t) * (-z)

    y = jnp.array([0.5, 0.1])
    x = euler_maruyama_cdiffe(sde, drift_a, key, y, num_samples=1000, xdim=2,
                              num_steps=50)
    assert x.shape == (1000, 2)
    assert np.all(np.isfinite(np.asarray(x)))


def test_em_bfloat16_dtype(key):
    """bf16 sampling path: carry dtype must stay bf16 through the scan."""
    sde = ReverseSDE()
    drift_a = lambda x, c, s: (-x).astype(x.dtype)
    x = euler_maruyama(sde, drift_a, key, None, 64, 2, 10, dtype=jnp.bfloat16)
    assert x.dtype == jnp.bfloat16
    assert np.all(np.isfinite(np.asarray(x, np.float32)))


def test_em_deterministic_under_same_key(key):
    sde = ReverseSDE()
    drift_a = lambda x, c, s: -x
    a = euler_maruyama(sde, drift_a, key, None, 64, 2, 10)
    b = euler_maruyama(sde, drift_a, key, None, 64, 2, 10)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_cdiffe_y_noise_variants(key):
    """All three y re-diffusion modes run, are finite, and 'mean' is
    deterministic given noise_scale=0 (testing hook)."""
    import pytest

    from dmip_tpu.problems import LinearForwardProblem
    from dmip_tpu.samplers import euler_maruyama_cdiffe
    from dmip_tpu.sde import ReverseSDE

    prob = LinearForwardProblem()
    sde = ReverseSDE()
    drift = lambda z, c, s: sde.base.g(s) * prob.diffused_joint_score(
        sde.base, z, s)
    y = jnp.asarray([0.4, -0.2])
    outs = {}
    for variant in ("fresh", "shared", "mean"):
        xs = euler_maruyama_cdiffe(sde, drift, key, y, 64, 2, 10,
                                   y_noise=variant)
        assert xs.shape == (64, 2)
        assert np.all(np.isfinite(np.asarray(xs)))
        outs[variant] = np.asarray(xs)
    assert not np.allclose(outs["fresh"], outs["mean"])

    a = euler_maruyama_cdiffe(sde, drift, key, y, 64, 2, 10,
                              y_noise="mean", noise_scale=0.0)
    b = euler_maruyama_cdiffe(sde, drift, key, y, 64, 2, 10,
                              y_noise="fresh", noise_scale=0.0)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)

    with pytest.raises(ValueError):
        euler_maruyama_cdiffe(sde, drift, key, y, 8, 2, 2, y_noise="bogus")


def test_heun_ode_beats_euler_at_equal_steps(key):
    """Probability-flow Heun sampler (samplers.heun_ode; no reference
    equivalent): with the EXACT diffused posterior score as drift, the
    second-order integrator's posterior moments must beat 1st-order E-M at
    the same step count, and land near the analytic posterior."""
    from dmip_tpu.samplers import heun_ode

    prob = LinearForwardProblem()
    sde = ReverseSDE()
    y = jnp.asarray([0.4, -0.2])
    drift = lambda z, c, s: sde.base.g(s) * prob.diffused_posterior_score(
        sde.base, z, y, s.reshape(-1)[0] if hasattr(s, "reshape") else s
    )
    mean_true, cov_true = prob.posterior_moments(y)
    n, steps = 20_000, 24

    def moment_err(xs):
        xs = np.asarray(xs)
        m = xs.mean(0)
        c = np.cov(xs.T)
        return (np.linalg.norm(m - np.asarray(mean_true))
                + np.linalg.norm(c - np.asarray(cov_true)))

    xs_heun = heun_ode(sde, drift, key, y, n, 2, steps)
    xs_em = euler_maruyama(sde, drift, key, y, n, 2, steps)
    assert xs_heun.shape == (n, 2)
    err_h, err_e = moment_err(xs_heun), moment_err(xs_em)
    assert err_h < err_e, (err_h, err_e)
    assert err_h < 0.05, err_h  # near-exact transport at only 24 steps

    # determinism given the key (integration is noise-free)
    again = heun_ode(sde, drift, key, y, n, 2, steps)
    np.testing.assert_allclose(np.asarray(xs_heun), np.asarray(again))


def test_heun_method_plumbed_through_model_sample(key):
    """CDE.sample(method='heun') drives the ODE path."""
    from dmip_tpu.models import CDE

    model = CDE(2, 2, (16, 16))
    params = model.init(key)
    xs = model.sample(params, key, jnp.asarray([0.1, 0.2]), 64, 12,
                      method="heun")
    assert xs.shape == (64, 2)
    assert np.all(np.isfinite(np.asarray(xs)))


def test_expint_beats_euler_at_equal_steps(key):
    """Exponential integrators (samplers.exponential_integrator; no
    reference equivalent): with the EXACT diffused posterior score, both the
    SDE and ODE order-2 forms at 16 steps must beat 1st-order E-M at the
    same step count, and 32-step SDE/o1 must land within 2x of EM-200."""
    from dmip_tpu.samplers import exponential_integrator

    prob = LinearForwardProblem()
    sde = ReverseSDE()
    y = jnp.asarray([0.4, -0.2])
    drift = lambda z, c, s: sde.base.g(s) * prob.diffused_posterior_score(
        sde.base, z, y, s.reshape(-1)[0] if hasattr(s, "reshape") else s
    )
    mean_true, cov_true = prob.posterior_moments(y)
    n = 20_000

    def moment_err(xs):
        xs = np.asarray(xs)
        return (np.linalg.norm(xs.mean(0) - np.asarray(mean_true))
                + np.linalg.norm(np.cov(xs.T) - np.asarray(cov_true)))

    err_em16 = moment_err(euler_maruyama(sde, drift, key, y, n, 2, 16))
    for ode in (False, True):
        xs = exponential_integrator(sde, drift, key, y, n, 2, 16,
                                    ode=ode, order=2)
        assert xs.shape == (n, 2)
        e = moment_err(xs)
        assert e < err_em16, (ode, e, err_em16)
        assert e < 0.06, (ode, e)

    e32 = moment_err(exponential_integrator(sde, drift, key, y, n, 2, 32))
    assert e32 < 0.04, e32

    # the ODE form is deterministic given the key (init only)
    a = exponential_integrator(sde, drift, key, y, 256, 2, 8, ode=True)
    b = exponential_integrator(sde, drift, key, y, 256, 2, 8, ode=True)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_expint_options_and_errors(key):
    """Grid/order/denoise knobs run and validate; unconditional works."""
    import pytest

    from dmip_tpu.samplers import exponential_integrator

    sde = ReverseSDE()
    drift = lambda x, c, s: sde.base.g(s) * (-x)
    for grid in ("uniform", "lambda"):
        for fd in (True, False):
            xs = exponential_integrator(sde, drift, key, None, 512, 2, 12,
                                        grid=grid, final_denoise=fd)
            assert xs.shape == (512, 2)
            assert np.all(np.isfinite(np.asarray(xs)))
    # stationary N(0,I) score: marginals must stay standard normal
    xs = exponential_integrator(sde, drift, key, None, 40_000, 2, 24)
    np.testing.assert_allclose(np.mean(np.asarray(xs), 0), 0.0, atol=0.03)
    np.testing.assert_allclose(np.cov(np.asarray(xs).T), np.eye(2), atol=0.04)
    with pytest.raises(ValueError):
        exponential_integrator(sde, drift, key, None, 8, 2, 4, grid="bogus")
    with pytest.raises(ValueError):
        exponential_integrator(sde, drift, key, None, 8, 2, 4, order=3)


def test_expint_method_plumbed_through_model_sample(key):
    """CDE.sample(method='expint[:...]') drives the exponential integrator."""
    import pytest

    from dmip_tpu.models import CDE

    model = CDE(2, 2, (16, 16))
    params = model.init(key)
    y = jnp.asarray([0.1, 0.2])
    for method in ("expint", "expint:ode:2", "expint:sde:1"):
        xs = model.sample(params, key, y, 64, 12, method=method)
        assert xs.shape == (64, 2)
        assert np.all(np.isfinite(np.asarray(xs)))
    # the ode and sde paths genuinely differ
    a = model.sample(params, key, y, 64, 12, method="expint:ode")
    b = model.sample(params, key, y, 64, 12, method="expint:sde")
    assert not np.allclose(np.asarray(a), np.asarray(b))
    with pytest.raises(ValueError):
        model.sample(params, key, y, 8, 4, method="expint:bogus")
