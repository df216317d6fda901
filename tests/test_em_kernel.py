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


def test_uniform_from_i24_range_and_mapping():
    """Host-side check of the in-kernel bits->uniform math on synthetic
    values (ADVICE r1: interpret-mode PRNG returns zeros, so the Box-Muller
    path was otherwise untested in CI)."""
    from dmip_tpu.ops.em_kernel import _uniform_from_i24

    # The kernel feeds (bits >> 8) viewed as int32: always in [0, 2^24).
    i24 = jnp.asarray([0, 1, (1 << 24) - 1], jnp.int32)
    u = np.asarray(_uniform_from_i24(i24))
    # bits=0 maps to 1 ulp (never 0, so log(u) is finite); max maps to 1.0
    assert u[0] == 2.0 ** -24
    np.testing.assert_allclose(u[1], 2.0 ** -24 * 2)
    np.testing.assert_allclose(u[2], 1.0, rtol=1e-7)
    assert np.all(u > 0.0) and np.all(u <= 1.0)

    # Full synthetic uint32 draw through the same >>8 view the kernel uses.
    rng = np.random.default_rng(0)
    bits = rng.integers(0, 2**32, size=200_000, dtype=np.uint32)
    i24 = jnp.asarray((bits >> 8).astype(np.int32))
    u = np.asarray(_uniform_from_i24(i24))
    assert u.min() > 0.0 and u.max() <= 1.0
    np.testing.assert_allclose(u.mean(), 0.5, atol=5e-3)
    np.testing.assert_allclose(u.var(), 1.0 / 12.0, rtol=2e-2)


def test_box_muller_moments_on_synthetic_bits():
    """Box-Muller math on host-generated uniforms: mean/var/skew/tail of a
    standard normal, independent of the Pallas PRNG."""
    from dmip_tpu.ops.em_kernel import _normal_from_uniforms, _uniform_from_i24

    rng = np.random.default_rng(1)
    n = 500_000
    bits1 = rng.integers(0, 2**32, size=n, dtype=np.uint32)
    bits2 = rng.integers(0, 2**32, size=n, dtype=np.uint32)
    u1 = _uniform_from_i24(jnp.asarray((bits1 >> 8).astype(np.int32)))
    u2 = _uniform_from_i24(jnp.asarray((bits2 >> 8).astype(np.int32)))
    z = np.asarray(_normal_from_uniforms(u1, u2))
    assert np.all(np.isfinite(z))
    np.testing.assert_allclose(z.mean(), 0.0, atol=6e-3)
    np.testing.assert_allclose(z.var(), 1.0, rtol=1e-2)
    np.testing.assert_allclose(np.mean(z**3), 0.0, atol=2e-2)
    # P(|z| > 1.96) ~ 0.05 for a standard normal
    np.testing.assert_allclose(np.mean(np.abs(z) > 1.96), 0.05, atol=3e-3)
