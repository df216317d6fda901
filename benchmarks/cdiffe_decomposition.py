"""Decompose the CDiffE fused-kernel's throughput gap vs the CDE kernel.

Round-4 verdict #8 (stretch): CDiffE measures ~84M sample-steps/s against
CDE's 120-133M at the same (30k x 200, 512x3) workload, attributed in a
code comment to the structural cost of in-kernel condition re-diffusion.
This script turns the attribution into a MEASURED decomposition by toggling
the two per-step features that differ (ops/em_kernel.py):

  * CDE  (_em_kernel):        first-layer K = xdim (y contribution is
    precomputed once — y is constant), noise draw (B, xdim).
  * CDiffE (_em_cdiffe_kernel): first-layer K = xdim + ydim on the
    concatenated [x, y_t] (y_t changes every step, nothing to precompute),
    noise draw (B, xdim + ydim) (integrator + y re-diffusion), plus the
    y_t = alpha y0 + std eps elementwise construction.

Grid: {CDE, CDiffE} x {noise on, noise off (noise_scale=0)}.  Differences:
  noise cost  = t(full) - t(noise_scale=0)          per variant
  structural  = t(CDiffE, no noise) - t(CDE, no noise)
                (the wide first matmul + y_t build, noise excluded)

MXU floor context: the first layer's extra K columns are FLOP-trivial
(26 vs 3 of a 128-wide systolic pass — same MXU tile count), so any
structural gap is VPU/layout work, not math.

Prints one JSON line; run on the TPU host: python benchmarks/cdiffe_decomposition.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from dmip_tpu.ops import fused_em_sampler, fused_em_sampler_cdiffe

N, STEPS, REPS = 30_000, 200, 5
XDIM, YDIM, H = 3, 23, 512


def _mlp(key, sizes):
    params = []
    for i, (a, b) in enumerate(zip(sizes[:-1], sizes[1:])):
        k1, k2, key = jax.random.split(key, 3)
        params.append((jax.random.normal(k1, (a, b)) / jnp.sqrt(a),
                       jax.random.normal(k2, (b,)) * 0.01))
    return params


def _measure(fn):
    jax.block_until_ready(fn(0))
    jax.block_until_ready(fn(999))
    t0 = time.time()
    for r in range(REPS):
        out = fn(r)
    jax.block_until_ready(out)
    return (time.time() - t0) / REPS


def main():
    key = jax.random.PRNGKey(0)
    kx, ky, kp = jax.random.split(key, 3)
    x0 = jax.random.normal(kx, (N, XDIM))
    y = jax.random.normal(ky, (YDIM,))

    # CDE net: [x, y, t] -> xdim;  CDiffE joint net: [x, y_t, t] -> xdim+ydim
    cde_params = _mlp(kp, (XDIM + YDIM + 1, H, H, H, XDIM))
    joint_params = _mlp(kp, (XDIM + YDIM + 1, H, H, H, XDIM + YDIM))

    def cde(noise_scale):
        f = jax.jit(lambda s: fused_em_sampler(
            cde_params, x0, y, num_steps=STEPS, seed=s,
            noise_scale=noise_scale))
        return _measure(f)

    def cdiffe(noise_scale):
        f = jax.jit(lambda s: fused_em_sampler_cdiffe(
            joint_params, x0, y, XDIM, num_steps=STEPS, seed=s,
            noise_scale=noise_scale))
        return _measure(f)

    t_cde = cde(1.0)
    t_cde0 = cde(0.0)
    t_cdf = cdiffe(1.0)
    t_cdf0 = cdiffe(0.0)

    steps = N * STEPS
    out = {
        "metric": "cdiffe_gap_decomposition",
        "cde_msteps_per_sec": steps / t_cde / 1e6,
        "cdiffe_msteps_per_sec": steps / t_cdf / 1e6,
        "gap_total_us_per_step": (t_cdf - t_cde) / STEPS * 1e6,
        "cde_noise_us_per_step": (t_cde - t_cde0) / STEPS * 1e6,
        "cdiffe_noise_us_per_step": (t_cdf - t_cdf0) / STEPS * 1e6,
        "structural_us_per_step": (t_cdf0 - t_cde0) / STEPS * 1e6,
        "seconds": {"cde": t_cde, "cde_no_noise": t_cde0,
                    "cdiffe": t_cdf, "cdiffe_no_noise": t_cdf0},
        "device": str(jax.devices()[0]),
        "workload": f"{N} x {STEPS} steps, {H}x3 net, xdim {XDIM} ydim {YDIM}",
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
