"""ELBO / reverse-SDE DSM / vendored-helper re-derivations."""

import jax
import jax.numpy as jnp
import numpy as np

from dmip_tpu.nets import mlp_init, score_mlp_apply
from dmip_tpu.sde import (
    ReverseSDE,
    elbo_random_t_slice,
    log_normal,
    reverse_sde_dsm,
    sample_v,
)


def test_log_normal_matches_scipy(key):
    from scipy.stats import norm

    x = jax.random.normal(key, (10,))
    out = log_normal(x, jnp.zeros(10), jnp.zeros(10))
    np.testing.assert_allclose(out, norm.logpdf(np.asarray(x)), rtol=1e-5)


def test_sample_v_types(key):
    v = sample_v(key, (1000, 3), "rademacher")
    assert set(np.unique(np.asarray(v))) == {-1.0, 1.0}
    v = sample_v(key, (1000, 3), "gaussian")
    assert np.abs(np.asarray(v).mean()) < 0.1


def test_reverse_sde_dsm_finite_and_positive(key):
    params = mlp_init(jax.random.PRNGKey(0), 5, 2, (16, 16))
    apply_a = lambda p, z, c, t: score_mlp_apply(p, z, c, t)
    sde = ReverseSDE()
    x = jax.random.normal(key, (32, 2))
    cond = jax.random.normal(jax.random.fold_in(key, 1), (32, 2))
    out = reverse_sde_dsm(sde, apply_a, params, key, x, cond)
    assert out.shape == (32,)
    assert np.all(np.asarray(out) >= 0)


def test_elbo_random_t_slice_runs(key):
    params = mlp_init(jax.random.PRNGKey(0), 5, 2, (16, 16))
    apply_a = lambda p, z, c, t: score_mlp_apply(p, z, c, t)
    sde = ReverseSDE()
    x = jax.random.normal(key, (64, 2))
    cond = jax.random.normal(jax.random.fold_in(key, 1), (64, 2))
    elbo = elbo_random_t_slice(sde, apply_a, params, key, x, cond)
    assert elbo.shape == (64,)
    assert np.all(np.isfinite(np.asarray(elbo)))
