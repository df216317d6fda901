"""Parity tests for the fused analytic-guidance DPS kernel
(dmip_tpu/ops/dps_kernel.py) against the XLA reference path
(losses.likelihood_score_target + samplers-style E-M update), in Pallas
interpret mode on CPU."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from dmip_tpu import losses as L
from dmip_tpu import nets
from dmip_tpu.ops.dps_kernel import fused_guided_em_sampler
from dmip_tpu.sde import VPSDE


@pytest.fixture
def key():
    return jax.random.PRNGKey(7)


def _setup(key, hidden=(32, 32), surr_hidden=(16, 16), xdim=3, ydim=5):
    kp, ks, kx, ky = jax.random.split(key, 4)
    prior_params = nets.mlp_init(kp, xdim + 1, xdim, hidden)
    surr_params = nets.mlp_init(ks, xdim, ydim, surr_hidden)

    def forward_fn(x):
        h = x
        for w, b in surr_params[:-1]:
            h = jax.nn.relu(h @ w + b)
        w, b = surr_params[-1]
        return h @ w + b

    x0 = jax.random.normal(kx, (8, xdim))
    y = jax.random.normal(ky, (ydim,)) * 0.3
    return prior_params, surr_params, forward_fn, x0, y


def _xla_guided_em(prior_params, forward_fn, x0, y, *, a, b, clip,
                   num_steps, base=VPSDE()):
    """Deterministic (noise-free) guided E-M, the XLA formulation the kernel
    must match: AnalyticGuidanceDPS.apply_a + samplers.euler_maruyama's
    update rule with lmbd=0."""
    n = x0.shape[0]
    ys = jnp.broadcast_to(y, (n, y.shape[-1]))
    delta = base.T / num_steps

    def apply_a(x, s):
        t_col = jnp.full((n, 1), s)
        s_prior = nets.prior_mlp_apply(prior_params, x, t_col)
        target = L.likelihood_score_target(
            nets.prior_mlp_apply, prior_params, base, forward_fn,
            x, ys, t_col, a=a, b=b, s_prior=s_prior,
        )
        alpha = base.mean_weight(t_col)
        s_lik = target / alpha
        if clip is not None:
            norm = jnp.linalg.norm(s_lik, axis=-1, keepdims=True)
            s_lik = s_lik * jnp.minimum(1.0, clip / (norm + 1e-12))
        return base.g(t_col) * (s_prior + s_lik)

    x = x0
    for i in range(num_steps):
        s = base.T - (i / num_steps) * base.T
        beta_s = base.beta_min + (base.beta_max - base.beta_min) * s
        g = jnp.sqrt(beta_s)
        mu = g * apply_a(x, s) + 0.5 * beta_s * x
        x = x + delta * mu
    return x


@pytest.mark.parametrize("clip", [10.0, None])
def test_fused_guided_kernel_matches_xla(key, clip):
    prior_params, surr_params, forward_fn, x0, y = _setup(key)
    want = _xla_guided_em(
        prior_params, forward_fn, x0, y, a=0.2, b=0.1, clip=clip, num_steps=8
    )
    got = fused_guided_em_sampler(
        prior_params, surr_params, x0, y,
        a=0.2, b=0.1, guidance_clip=clip, num_steps=8,
        noise_scale=0.0, block_rows=8, interpret=pltpu.InterpretParams(),
    )
    assert np.all(np.isfinite(np.asarray(got)))
    # Unclipped guidance amplifies f32 rounding through the trajectory
    # (the very instability the clip exists for); clipped runs match tightly.
    rtol = 2e-4 if clip is not None else 1e-2
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=rtol, atol=rtol)


def test_fused_guided_kernel_pads_ragged_batch(key):
    prior_params, surr_params, forward_fn, x0, y = _setup(key)
    x0 = jnp.concatenate([x0, x0[:3]], axis=0)  # 11 rows, block_rows=4
    want = _xla_guided_em(
        prior_params, forward_fn, x0, y, a=0.2, b=0.1, clip=5.0, num_steps=4
    )
    got = fused_guided_em_sampler(
        prior_params, surr_params, x0, y,
        a=0.2, b=0.1, guidance_clip=5.0, num_steps=4,
        noise_scale=0.0, block_rows=4, interpret=pltpu.InterpretParams(),
    )
    assert got.shape == (11, 3)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


def test_fused_guided_kernel_rejects_conditional_prior(key):
    prior_params, surr_params, _, x0, y = _setup(key)
    bad = nets.mlp_init(key, 3 + 5 + 1, 3, (16,))  # [x, y, t] layout
    with pytest.raises(ValueError, match="xdim"):
        fused_guided_em_sampler(
            bad, surr_params, x0, y, a=0.2, b=0.1, num_steps=2,
            noise_scale=0.0, block_rows=8, interpret=pltpu.InterpretParams(),
        )


def _xla_pgdm_em(prior_params, forward_fn, x0, y, *, a, b, clip,
                 num_steps, base=VPSDE()):
    """Noise-free ΠGDM-guided E-M, the XLA formulation the fused pgdm
    kernel must match (losses.pgdm_likelihood_score + the E-M update)."""
    n = x0.shape[0]
    ys = jnp.broadcast_to(y, (n, y.shape[-1]))
    delta = base.T / num_steps

    def apply_a(x, s):
        t_col = jnp.full((n, 1), s)
        s_prior = nets.prior_mlp_apply(prior_params, x, t_col)
        s_lik = L.pgdm_likelihood_score(
            nets.prior_mlp_apply, prior_params, base, forward_fn,
            x, ys, t_col, a=a, b=b,
        )
        if clip is not None:
            norm = jnp.linalg.norm(s_lik, axis=-1, keepdims=True)
            s_lik = s_lik * jnp.minimum(1.0, clip / (norm + 1e-12))
        return base.g(t_col) * (s_prior + s_lik)

    x = x0
    for i in range(num_steps):
        s = base.T - (i / num_steps) * base.T
        beta_s = base.beta_min + (base.beta_max - base.beta_min) * s
        mu = jnp.sqrt(beta_s) * apply_a(x, s) + 0.5 * beta_s * x
        x = x + delta * mu
    return x


def test_fused_pgdm_kernel_matches_xla(key):
    prior_params, surr_params, forward_fn, x0, y = _setup(key)
    want = _xla_pgdm_em(
        prior_params, forward_fn, x0, y, a=0.2, b=0.1, clip=10.0, num_steps=8
    )
    got = fused_guided_em_sampler(
        prior_params, surr_params, x0, y,
        a=0.2, b=0.1, guidance_clip=10.0, num_steps=8, guidance="pgdm",
        noise_scale=0.0, block_rows=8, interpret=pltpu.InterpretParams(),
    )
    assert np.all(np.isfinite(np.asarray(got)))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=5e-4, atol=5e-4)


def test_fused_pgdm_kernel_real_surrogate_single_step(key):
    """One guided step against the REAL 4-layer frozen surrogate (the
    production shapes: 3 -> 256^3 -> 23 relu)."""
    from dmip_tpu.problems import scatterometry as scat

    fwd, p = scat.load_forward_model()
    sw = scat.load_surrogate_weights()
    prior_params = nets.mlp_init(key, 4, 3, (64, 64))
    kx, _ = jax.random.split(key)
    x0 = jax.random.normal(kx, (8, 3)) * 0.1
    y = fwd(x0[0])
    want = _xla_pgdm_em(prior_params, fwd, x0, y, a=p["a"], b=p["b"],
                        clip=10.0, num_steps=2)
    got = fused_guided_em_sampler(
        prior_params, sw, x0, y, a=p["a"], b=p["b"], guidance_clip=10.0,
        num_steps=2, guidance="pgdm", noise_scale=0.0, block_rows=8,
        interpret=pltpu.InterpretParams(),
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-3, atol=1e-3)


def test_fused_pgdm_kernel_rejects_non_3d(key):
    prior_params = nets.mlp_init(key, 3, 2, (8,))
    surr_params = nets.mlp_init(key, 2, 4, (8,))
    x0 = jnp.zeros((4, 2))
    with pytest.raises(ValueError, match="xdim=3"):
        fused_guided_em_sampler(
            prior_params, surr_params, x0, jnp.zeros(4), a=0.2, b=0.1,
            guidance="pgdm", num_steps=1, noise_scale=0.0, block_rows=4,
            interpret=pltpu.InterpretParams(),
        )
