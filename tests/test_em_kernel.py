"""Fused Pallas EM kernel: exact deterministic parity with the XLA scan.

Runs under the Pallas TPU interpreter on CPU.  The interpreter's PRNG
returns zeros, so the stochastic path is validated statistically on real
TPU (see benchmarks / the stats harness); here noise_scale=0 gives an
EXACT trajectory comparison of the integrator + net math.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from dmip_tpu.nets import mlp_init, score_mlp_apply
from dmip_tpu.ops.em_kernel import fused_em_sampler
from dmip_tpu.samplers import euler_maruyama
from dmip_tpu.sde import ReverseSDE


def test_deterministic_parity_with_xla_sampler(key):
    params = mlp_init(jax.random.PRNGKey(0), 5, 2, (64, 64))
    apply_a = lambda z, c, s: score_mlp_apply(params, z, c, s)
    sde = ReverseSDE()
    y = jnp.array([0.8, -0.3])
    N = 512
    x_ref = euler_maruyama(sde, apply_a, key, y, N, 2, 40, noise_scale=0.0)
    k0, _ = jax.random.split(key)
    x0 = jax.random.normal(k0, (N, 2))
    x_pal = fused_em_sampler(
        params, x0, y, num_steps=40, seed=7, block_rows=256,
        compute_dtype=jnp.float32, noise_scale=0.0,
        interpret=pltpu.InterpretParams(),
    )
    ref = np.asarray(x_ref)
    rel = np.abs(ref - np.asarray(x_pal)).max() / (np.abs(ref).max() + 1e-9)
    assert rel < 1e-4, rel


def test_padding_and_uneven_batch(key):
    params = mlp_init(jax.random.PRNGKey(0), 5, 2, (32,))
    y = jnp.array([0.1, 0.2])
    x0 = jax.random.normal(key, (300, 2))  # not a multiple of block_rows
    out = fused_em_sampler(
        params, x0, y, num_steps=5, seed=1, block_rows=128,
        compute_dtype=jnp.float32, noise_scale=0.0,
        interpret=pltpu.InterpretParams(),
    )
    assert out.shape == (300, 2)
    assert np.all(np.isfinite(np.asarray(out)))


def test_lmbd_deterministic_scaling(key):
    """lmbd scales the drift by (1 - lmbd/2) on the a-term only."""
    params = mlp_init(jax.random.PRNGKey(0), 5, 2, (32,))
    apply_a = lambda z, c, s: score_mlp_apply(params, z, c, s)
    sde = ReverseSDE()
    y = jnp.array([0.1, 0.2])
    k0, _ = jax.random.split(key)
    x0 = jax.random.normal(k0, (256, 2))
    for lmbd in (0.0, 0.5):
        x_ref = euler_maruyama(
            sde, apply_a, key, y, 256, 2, 20, lmbd=lmbd, noise_scale=0.0
        )
        x_pal = fused_em_sampler(
            params, x0, y, num_steps=20, lmbd=lmbd, seed=3, block_rows=256,
            compute_dtype=jnp.float32, noise_scale=0.0,
            interpret=pltpu.InterpretParams(),
        )
        np.testing.assert_allclose(
            np.asarray(x_ref), np.asarray(x_pal), rtol=1e-4, atol=1e-4
        )


def test_cdiffe_deterministic_parity(key):
    """Fused CDiffE kernel vs XLA CDiffE scan at noise_scale=0 (both the
    re-diffusion and integrator noise zeroed): exact trajectories."""
    from dmip_tpu.ops.em_kernel import fused_em_sampler_cdiffe
    from dmip_tpu.samplers import euler_maruyama_cdiffe

    xdim, ydim = 2, 2
    params = mlp_init(jax.random.PRNGKey(0), xdim + ydim + 1, xdim + ydim,
                      (64, 64))
    apply_a = lambda z, c, s: score_mlp_apply(params, z, c, s)
    sde = ReverseSDE()
    y = jnp.array([0.8, -0.3])
    N = 512
    x_ref = euler_maruyama_cdiffe(sde, apply_a, key, y, N, xdim, 40,
                                  noise_scale=0.0)
    k0, _ = jax.random.split(key, 2)[:2]
    k0 = jax.random.split(key, 3)[0]
    x0 = jax.random.normal(k0, (N, xdim))
    x_pal = fused_em_sampler_cdiffe(
        params, x0, y, xdim, num_steps=40, seed=7, block_rows=256,
        compute_dtype=jnp.float32, noise_scale=0.0,
        interpret=pltpu.InterpretParams(),
    )
    ref = np.asarray(x_ref)
    rel = np.abs(ref - np.asarray(x_pal)).max() / (np.abs(ref).max() + 1e-9)
    assert rel < 1e-4, rel
