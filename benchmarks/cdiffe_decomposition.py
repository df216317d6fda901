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

Grid: {CDE, CDiffE} x {noise on, noise off (noise_scale=0)}, plus the
DECISIVE probe: the full kernel with draws generated AND consumed but y_t
kept a broadcast row (bcast_yt) — isolating "cost of the noise draws"
from "cost of a PER-ROW y_t entering the first-layer operand".

Round-5 conclusion (measured on this chip, BENCHMARKS.md):
  * draws are free: bcast_yt runs at CDE speed with the full (B, 26)
    draw still sliced into the integrator;
  * the entire ~107 us/step gap is the per-row y_t data path.  Refuted
    candidate explanations, each measured: split aligned draws (equal),
    split first-layer matmuls avoiding the concat (worse, +23 us/step),
    lane-8-aligned y block via x-padding (no change), block_rows
    512..3072 (invariant — per-row, not per-block cost);
  * hence the residual CDiffE-vs-CDE gap is the ALGORITHM's extra state:
    CDiffE re-diffuses the condition per sample per step, so the net's
    input is fully per-row where CDE's condition block is a precomputed
    constant row.  ~3.6 ns/row/step of VPU operand work is the measured
    price of that semantic, not an implementation artifact.

MXU floor context: the first layer's extra K columns are FLOP-trivial
(26 vs 3 of a 128-wide systolic pass — same MXU tile count).

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

    def cdiffe_bcast_yt():
        """Full draws consumed by the integrator, y_t broadcast: isolates
        the per-row-y_t data path from the noise generation."""
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        from dmip_tpu.ops import em_kernel as ek

        def patched(seed_ref, x0_ref, y_ref, w1xy_ref, w1t_ref, b1_ref,
                    *rest_refs, num_steps, n_rest, T, beta_min, beta_max,
                    lmbd, noise_scale, compute_dtype):
            out_ref = rest_refs[-1]
            layer_refs = rest_refs[:-1]
            pltpu.prng_seed(seed_ref[0], pl.program_id(0))
            x0_ = x0_ref[:]
            y0 = y_ref[:]
            w1xy = w1xy_ref[:]
            w1t = w1t_ref[:]
            b1 = b1_ref[:]
            xd = x0_.shape[1]
            yd = y0.shape[1]
            delta = T / num_steps
            sqrt_delta = delta ** 0.5
            bd = beta_max - beta_min

            def tail(h):
                for i in range(n_rest - 1):
                    w = layer_refs[2 * i][:]
                    b = layer_refs[2 * i + 1][:]
                    acc = jax.lax.dot_general(
                        h, w, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                    h = jnp.tanh(acc + b).astype(compute_dtype)
                w = layer_refs[2 * (n_rest - 1)][:]
                b = layer_refs[2 * (n_rest - 1) + 1][:]
                return jax.lax.dot_general(
                    h, w, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32) + b

            def step(i, x):
                t = (i.astype(jnp.float32) / num_steps) * T
                s = T - t
                beta_s = beta_min + bd * s
                g = jnp.sqrt(beta_s)
                int_beta = 0.5 * bd * s ** 2 + beta_min * s
                alpha = jnp.exp(-0.5 * int_beta)
                eps = noise_scale * ek._box_muller((x.shape[0], xd + yd))
                y_t = jnp.broadcast_to(alpha * y0, (x.shape[0], yd))
                z = jnp.concatenate([x, y_t], axis=1)
                acc = jax.lax.dot_general(
                    z.astype(compute_dtype), w1xy, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                h = jnp.tanh(acc + s * w1t + b1).astype(compute_dtype)
                a_x = tail(h)
                mu = (1.0 - 0.5 * lmbd) * g * a_x + 0.5 * beta_s * x
                sigma = (1.0 - lmbd) ** 0.5 * g
                return x + delta * mu + sqrt_delta * sigma * eps[:, :xd]

            out_ref[:] = jax.lax.fori_loop(0, num_steps, step, x0_)

        orig = ek._em_cdiffe_kernel
        ek._em_cdiffe_kernel = patched
        try:
            f = jax.jit(lambda s: fused_em_sampler_cdiffe(
                joint_params, x0, y, XDIM, num_steps=STEPS, seed=s))
            return _measure(f)
        finally:
            ek._em_cdiffe_kernel = orig

    t_cde = cde(1.0)
    t_cde0 = cde(0.0)
    t_cdf = cdiffe(1.0)
    t_cdf0 = cdiffe(0.0)
    t_bcast = cdiffe_bcast_yt()

    steps = N * STEPS
    out = {
        "metric": "cdiffe_gap_decomposition",
        "cde_msteps_per_sec": steps / t_cde / 1e6,
        "cdiffe_msteps_per_sec": steps / t_cdf / 1e6,
        "gap_total_us_per_step": (t_cdf - t_cde) / STEPS * 1e6,
        "cde_noise_us_per_step": (t_cde - t_cde0) / STEPS * 1e6,
        "cdiffe_noise_us_per_step": (t_cdf - t_cdf0) / STEPS * 1e6,
        "structural_us_per_step": (t_cdf0 - t_cde0) / STEPS * 1e6,
        "draws_only_us_per_step": (t_bcast - t_cde) / STEPS * 1e6,
        "per_row_yt_us_per_step": (t_cdf - t_bcast) / STEPS * 1e6,
        "seconds": {"cde": t_cde, "cde_no_noise": t_cde0,
                    "cdiffe": t_cdf, "cdiffe_no_noise": t_cdf0,
                    "cdiffe_bcast_yt": t_bcast},
        "device": str(jax.devices()[0]),
        "workload": f"{N} x {STEPS} steps, {H}x3 net, xdim {XDIM} ydim {YDIM}",
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
