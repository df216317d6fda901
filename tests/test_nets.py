"""Score-net tests: shapes, torch-Linear init statistics, Fourier embedding
parity, TemporalMLP variants."""

import jax
import jax.numpy as jnp
import numpy as np

from dmip_tpu import nets


def test_mlp_shapes_and_init_stats(key):
    params = nets.mlp_init(key, 5, 2, (512, 512, 512))
    dims = [(5, 512), (512, 512), (512, 512), (512, 2)]
    assert [(w.shape, b.shape) for w, b in params] == [
        (d, (d[1],)) for d in dims
    ]
    # torch nn.Linear default: U(-1/sqrt(fan_in), 1/sqrt(fan_in))
    w = np.asarray(params[1][0])
    bound = 1 / np.sqrt(512)
    assert np.abs(w).max() <= bound + 1e-6
    np.testing.assert_allclose(w.std(), bound / np.sqrt(3), rtol=0.05)


def test_score_mlp_concat_order(key):
    """a(x, y, t) must equal a plain apply on concat([x, y, t])."""
    params = nets.mlp_init(key, 5, 2, (16,))
    x = jax.random.normal(key, (4, 2))
    y = jax.random.normal(jax.random.fold_in(key, 1), (4, 2))
    t = jnp.full((4, 1), 0.3)
    out = nets.score_mlp_apply(params, x, y, t)
    manual = nets.mlp_apply(params, jnp.concatenate([x, y, t], axis=1))
    np.testing.assert_allclose(out, manual, rtol=1e-6)
    # scalar t broadcasting
    out_scalar = nets.score_mlp_apply(params, x, y, 0.3)
    np.testing.assert_allclose(out_scalar, manual, rtol=1e-6)
    # empty / None condition -> [x, t] only (CDiffE convention)
    params2 = nets.mlp_init(key, 3, 2, (16,))
    out_none = nets.score_mlp_apply(params2, x, None, t)
    manual2 = nets.mlp_apply(params2, jnp.concatenate([x, t], axis=1))
    np.testing.assert_allclose(out_none, manual2, rtol=1e-6)


def test_posterior_score_composition(key):
    from dmip_tpu.sde import VPSDE

    sde = VPSDE()
    kp, kl = jax.random.split(key)
    prior = nets.mlp_init(kp, 3, 2, (16,))
    lik = nets.mlp_init(kl, 5, 2, (16,))
    x = jax.random.normal(key, (4, 2))
    y = jax.random.normal(jax.random.fold_in(key, 2), (4, 2))
    t = jnp.full((4, 1), 0.4)
    out = nets.posterior_score_apply(prior, lik, sde.g, x, y, t)
    expected = sde.g(t) * (
        nets.prior_mlp_apply(prior, x, t) + nets.score_mlp_apply(lik, x, y, t)
    )
    np.testing.assert_allclose(out, expected, rtol=1e-6)


def test_fourier_embedding_matches_torch_formula(key):
    """[sin(2 pi t W), cos(2 pi t W)] — torch mirror of reference
    GaussianFourierProjection (nets.py:6-15)."""
    w = nets.fourier_init(key, 8, scale=30.0)
    t = jnp.array([0.1, 0.5])
    out = nets.fourier_apply(w, t)
    proj = np.asarray(t)[:, None] * np.asarray(w)[None, :] * 2 * np.pi
    expected = np.concatenate([np.sin(proj), np.cos(proj)], axis=-1)
    np.testing.assert_allclose(out, expected, rtol=1e-5)
    assert out.shape == (2, 8)


def test_temporal_mlp(key):
    params = nets.temporal_mlp_init(key, 2 + 2, 2, embed_dim=8,
                                    hidden_layers=(16, 16))
    x = jax.random.normal(key, (4, 2))
    y = jax.random.normal(jax.random.fold_in(key, 1), (4, 2))
    t = jnp.full((4,), 0.3)
    out = nets.temporal_mlp_apply(params, x, t, y)
    assert out.shape == (4, 2)
    assert np.all(np.isfinite(np.asarray(out)))
