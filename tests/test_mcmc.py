"""MCMC kernel tests: stationarity, detailed balance statistics, log-det."""

import jax
import jax.numpy as jnp
import numpy as np

from dmip_tpu import mcmc


def _gauss_energy(x):
    return 0.5 * jnp.sum(x**2, axis=1)


def test_metropolis_targets_standard_normal(key):
    """Long MH run from a bad init must produce N(0, I) samples."""
    k0, kr = jax.random.split(key)
    x0 = jax.random.uniform(k0, (20_000, 2)) * 6.0 - 3.0  # wide uniform init
    x, logdet = jax.jit(
        lambda k, x: mcmc.anneal_to_energy(k, x, _gauss_energy, 500, noise_std=0.5)
    )(kr, x0)
    xs = np.asarray(x)
    np.testing.assert_allclose(xs.mean(0), 0.0, atol=0.03)
    np.testing.assert_allclose(np.cov(xs.T), np.eye(2), atol=0.05)
    assert logdet.shape == (20_000,)


def test_metropolis_acceptance_all_when_downhill(key):
    """Proposals that lower the energy are always accepted: with a huge
    temperature target, e_diff >= 1 for most moves and chains move."""
    x0 = jnp.zeros((1000, 2))
    x, _ = mcmc.anneal_to_energy(key, x0, _gauss_energy, 1, noise_std=0.1)
    # ~100% acceptance near the mode for small steps: most chains moved
    moved = np.mean(np.any(np.asarray(x) != 0.0, axis=1))
    assert moved > 0.9


def test_energy_grad(key):
    x = jax.random.normal(key, (7, 3))
    g, e = mcmc.energy_grad(x, _gauss_energy)
    np.testing.assert_allclose(g, x, rtol=1e-5)
    np.testing.assert_allclose(e, 0.5 * np.sum(np.asarray(x) ** 2, 1), rtol=1e-5)


def test_langevin_step_moves_toward_mode(key):
    """ULA on N(0,I) from a distant start: mean energy must drop."""
    k0, kl = jax.random.split(key)
    x0 = jax.random.normal(k0, (5000, 2)) + 4.0
    x, log_det, e_first, e_last = mcmc.langevin_step(
        kl, x0, stepsize=0.05, energy=_gauss_energy, lang_steps=50
    )
    assert float(jnp.mean(e_last)) < float(jnp.mean(e_first))
    assert log_det.shape == (5000,)
    assert np.all(np.isfinite(np.asarray(log_det)))


def test_mala_targets_standard_normal(key):
    k0, kr = jax.random.split(key)
    x0 = jax.random.normal(k0, (10_000, 2)) * 3.0
    x, _ = jax.jit(
        lambda k, x: mcmc.anneal_to_energy(
            k, x, _gauss_energy, 100, langevin_prop=True, lang_steps=1,
            stepsize=0.05,
        )
    )(kr, x0)
    xs = np.asarray(x)
    np.testing.assert_allclose(xs.mean(0), 0.0, atol=0.05)
    np.testing.assert_allclose(np.cov(xs.T), np.eye(2), atol=0.08)


def test_interpolated_energy_endpoints():
    ys = jnp.zeros((4, 2))
    nlp = lambda x, ys: jnp.full(x.shape[0], 7.0)
    x = jnp.ones((4, 2))
    e0 = mcmc.interpolated_energy(ys, 0.0, nlp)(x)
    np.testing.assert_allclose(e0, 1.0)  # ||x||^2/2 = 1
    e1 = mcmc.interpolated_energy(ys, 1.0, nlp)(x)
    np.testing.assert_allclose(e1, 7.0)
    eh = mcmc.interpolated_energy(ys, 0.5, nlp)(x)
    np.testing.assert_allclose(eh, 0.5 * 7.0 + 0.5 * 1.0)


def test_annealed_mh_fixed_lambda_targets_standard_normal(key):
    """lambda0=1 degenerates to a plain MH chain on the posterior energy:
    a long run from a bad init must produce N(0, I) samples."""
    k0, kr = jax.random.split(key)
    x0 = jax.random.uniform(k0, (20_000, 2)) * 6.0 - 3.0
    x, info = jax.jit(
        lambda k, x: mcmc.annealed_mh(k, x, _gauss_energy, 500, noise_std=0.5)
    )(kr, x0)
    xs = np.asarray(x)
    np.testing.assert_allclose(xs.mean(0), 0.0, atol=0.03)
    np.testing.assert_allclose(np.cov(xs.T), np.eye(2), atol=0.05)
    assert info["acc_rate"].shape == (500,)
    # no adaptation requested: the proposal std is untouched
    np.testing.assert_allclose(float(info["noise_std"]), 0.5, rtol=1e-6)


def test_annealed_mh_schedule_targets_final_energy(key):
    """Annealing lam 0 -> 1 from prior samples must land on the posterior:
    target N(m, 0.5 I) with m=(2,2); prior N(0,I) samples anneal across."""
    m = jnp.array([2.0, 2.0])
    energy = lambda x: jnp.sum((x - m) ** 2, axis=1)  # N(m, 0.5 I)
    k0, kr = jax.random.split(key)
    x0 = jax.random.normal(k0, (20_000, 2))  # exact lam=0 target
    x, _ = jax.jit(
        lambda k, x: mcmc.annealed_mh(
            k, x, energy, 400, noise_std=0.4, lambda0=0.0
        )
    )(kr, x0)
    xs = np.asarray(x)
    np.testing.assert_allclose(xs.mean(0), np.asarray(m), atol=0.05)
    np.testing.assert_allclose(np.cov(xs.T), 0.5 * np.eye(2), atol=0.05)


def test_annealed_mh_anneal_then_polish(key):
    """anneal_frac=0.5: the lambda ramp covers the first half of the chain,
    the second half polishes at the final target — the endpoint statistics
    must match the fully-annealed chain's (the final target is the same)."""
    m = jnp.array([2.0, 2.0])
    energy = lambda x: jnp.sum((x - m) ** 2, axis=1)  # N(m, 0.5 I)
    k0, kr = jax.random.split(key)
    x0 = jax.random.normal(k0, (20_000, 2))
    x, info = jax.jit(
        lambda k, x: mcmc.annealed_mh(
            k, x, energy, 400, noise_std=0.4, lambda0=0.0, anneal_frac=0.5
        )
    )(kr, x0)
    xs = np.asarray(x)
    np.testing.assert_allclose(xs.mean(0), np.asarray(m), atol=0.05)
    np.testing.assert_allclose(np.cov(xs.T), 0.5 * np.eye(2), atol=0.05)
    assert info["acc_rate"].shape == (400,)


def test_annealed_mh_tempered_endpoint(key):
    """lambda1 < 1 (tempered refinement) stations the chain on the
    prior-blended target: E_post = ||x||^2 (N(0, 0.5 I)) at lambda1=0.5
    gives 0.5 ||x||^2 + 0.25 ||x||^2 -> N(0, 2/3 I)."""
    energy = lambda x: jnp.sum(x**2, axis=1)
    k0, kr = jax.random.split(key)
    x0 = jax.random.normal(k0, (20_000, 2)) * jnp.sqrt(0.5)
    x, _ = jax.jit(
        lambda k, x: mcmc.annealed_mh(
            k, x, energy, 400, noise_std=0.4, lambda0=1.0, lambda1=0.5
        )
    )(kr, x0)
    var = float(np.asarray(x).var())
    assert abs(var - 2.0 / 3.0) < 0.05, var


def test_annealed_mh_adapts_to_target_acceptance(key):
    """Robbins-Monro adaptation: starting from a far-too-large proposal std,
    the late-chain acceptance rate must converge near the target."""
    k0, kr = jax.random.split(key)
    x0 = jax.random.normal(k0, (10_000, 2))
    _, info = jax.jit(
        lambda k, x: mcmc.annealed_mh(
            k, x, _gauss_energy, 200, noise_std=5.0, target_acc=0.4
        )
    )(kr, x0)
    late_acc = float(np.mean(np.asarray(info["acc_rate"])[-20:]))
    assert abs(late_acc - 0.4) < 0.08
    # sigma moved down from the bad init
    assert float(info["noise_std"]) < 5.0


def test_scatterometry_mcmc_stays_in_box(key):
    """MH on the scatterometry energy: samples concentrate in [-1,1]^3."""
    from dmip_tpu.problems import scatterometry as scat

    fwd, p = scat.load_forward_model()
    k0, kd, kr = jax.random.split(key, 3)
    x_star = jax.random.uniform(kd, (1, 3)) * 2 - 1
    y = scat.noisy_forward(kd, fwd, x_star, p["a"], p["b"])
    ys = jnp.broadcast_to(y, (2000, 23))
    energy = lambda x: scat.get_log_posterior(
        x, fwd, p["a"], p["b"], ys, p["lambd_bd"]
    )
    x0 = jax.random.uniform(k0, (2000, 3)) * 2 - 1
    x, _ = jax.jit(
        lambda k, x: mcmc.anneal_to_energy(k, x, energy, 200, noise_std=0.5)
    )(kr, x0)
    frac_in = np.mean(np.all(np.abs(np.asarray(x)) <= 1.01, axis=1))
    assert frac_in > 0.98
