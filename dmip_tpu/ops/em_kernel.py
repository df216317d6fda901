"""Pallas TPU kernel: fully-fused reverse-SDE Euler-Maruyama sampler.

The evaluation hot path (SURVEY.md §3.2) integrates the plug-in reverse SDE
for 200 steps over >=30k-sample batches of a small tanh MLP.  The XLA scan
version re-streams weights and activations through HBM every step; this
kernel keeps the ENTIRE loop on-chip:

  * score-net weights live in VMEM for all steps (~1-2 MB);
  * the batch is tiled over a 1-D grid (block_rows rows per program);
  * the condition's first-layer contribution  cy = y @ W1_y + b1  is
    computed ONCE per program (it is constant across time steps and, for the
    single-condition sampler, across rows);
  * per step, only x changes:  h1 = tanh(x @ W1_x + t * w1_t + cy), then
    the hidden matmuls run on the MXU (optionally bf16) with f32 accumulation;
  * Gaussian step noise is generated in-kernel (Box-Muller over the TPU
    PRNG), seeded per (seed, program_id) — fully deterministic.

Matches the reference sampler's time grid exactly (ts[i] = i/num_steps * T,
x += delta*mu + sqrt(delta)*g*xi; models/diffusion.py:27-46).  The initial
x0 ~ N(mean, std^2) is drawn OUTSIDE with jax.random for exact
key-compatibility with the XLA path's initialization.

The XLA wrapper around the pallas_call is kept to bare padding/astype: this
image's libtpu crashes (SIGILL) in the fusion cost model on some flat
(N, tiny) element-wise graphs, so everything interesting happens in-kernel.
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array


def _uniform_from_i24(i24: Array) -> Array:
    """int32 in [0, 2^24) -> float32 uniform in (0, 1].

    Pure math, shared by the in-kernel path and the host-side unit tests
    (tests/test_em_kernel.py): scale the 24-bit integer and add 1 ulp so
    log() never sees 0.
    """
    return i24.astype(jnp.float32) * (1.0 / (1 << 24)) + (2.0 ** -24)


def _normal_from_uniforms(u1: Array, u2: Array) -> Array:
    """Box-Muller: two (0, 1] uniforms -> one standard normal (pure math)."""
    r = jnp.sqrt(-2.0 * jnp.log(u1))
    return r * jnp.cos((2.0 * jnp.pi) * u2)


def _uniform_from_bits(bits: Array) -> Array:
    """uint32 random bits -> float32 uniform in (0, 1]."""
    # top 24 bits; Mosaic has no uint32->f32 cast; >>8 clears the sign bit
    # so the int32 view is exact.
    return _uniform_from_i24(pltpu.bitcast(bits >> 8, jnp.int32))


def _box_muller(shape) -> Array:
    """Standard normal via Box-Muller from the seeded TPU PRNG."""
    u1 = _uniform_from_bits(pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32))
    u2 = _uniform_from_bits(pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32))
    return _normal_from_uniforms(u1, u2)


def _em_kernel(
    seed_ref,
    x0_ref,
    y_ref,
    w1x_ref,
    w1y_ref,
    w1t_ref,
    b1_ref,
    *rest_refs,
    num_steps: int,
    n_rest: int,
    T: float,
    beta_min: float,
    beta_max: float,
    lmbd: float,
    noise_scale: float,
    compute_dtype,
):
    """One batch block: run all num_steps EM updates in VMEM.

    rest_refs layout: [W2, b2, ..., Wout, bout, out_ref] — the n_rest
    (W, b) pairs after layer 1, with tanh between all but the last.
    """
    out_ref = rest_refs[-1]
    layer_refs = rest_refs[:-1]

    pltpu.prng_seed(seed_ref[0], pl.program_id(0))

    x0 = x0_ref[:]  # (B, xdim) f32
    w1x = w1x_ref[:]  # (xdim, H1), already compute_dtype
    w1t = w1t_ref[:]  # (1, H1) f32
    # condition contribution, constant over steps and rows: (1, H1)
    cy = (
        jax.lax.dot_general(
            y_ref[:], w1y_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        + b1_ref[:]
    )

    delta = T / num_steps
    sqrt_delta = delta**0.5
    bd = beta_max - beta_min

    def net(x, s):
        acc = jax.lax.dot_general(
            x.astype(compute_dtype), w1x,
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        h = jnp.tanh(acc + s * w1t + cy).astype(compute_dtype)
        for i in range(n_rest - 1):
            w = layer_refs[2 * i][:]
            b = layer_refs[2 * i + 1][:]
            acc = jax.lax.dot_general(
                h, w, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            h = jnp.tanh(acc + b).astype(compute_dtype)
        w = layer_refs[2 * (n_rest - 1)][:]
        b = layer_refs[2 * (n_rest - 1) + 1][:]
        acc = jax.lax.dot_general(
            h, w, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return acc + b  # (B, xdim) f32

    def step(i, x):
        t = (i.astype(jnp.float32) / num_steps) * T
        s = T - t
        beta_s = beta_min + bd * s
        g = jnp.sqrt(beta_s)
        a = net(x, s)
        # mu = (1 - lmbd/2) g a - f(s, x),  f = -beta/2 x
        mu = (1.0 - 0.5 * lmbd) * g * a + 0.5 * beta_s * x
        if noise_scale == 0.0:
            return x + delta * mu
        sigma = (1.0 - lmbd) ** 0.5 * g
        noise = noise_scale * _box_muller(x.shape)
        return x + delta * mu + sqrt_delta * sigma * noise

    out_ref[:] = jax.lax.fori_loop(0, num_steps, step, x0)


def _em_cdiffe_kernel(
    seed_ref,
    x0_ref,
    y_ref,
    w1xy_ref,
    w1t_ref,
    b1_ref,
    *rest_refs,
    num_steps: int,
    n_rest: int,
    T: float,
    beta_min: float,
    beta_max: float,
    lmbd: float,
    noise_scale: float,
    compute_dtype,
):
    """CDiffE variant: per step, re-diffuse the observed y to time T - t
    (fresh in-kernel noise), feed [x, y_t, t] through the joint net, and
    advance only the x block (models/diffusion.py:158-180; output weights
    are pre-sliced to the x block outside).

    Round-4 perf restructuring (both changes distribution-preserving):
      * ONE Box-Muller draw of (B, xdim + ydim) per step, sliced into the
        integrator noise and the y re-diffusion noise — the PRNG +
        log/cos passes run on <=1-vreg-wide arrays, so two narrow draws
        cost double one combined draw;
      * ONE fused first-layer matmul on the concatenated [x, y_t] block
        (the weight rows are contiguous in the joint net) instead of two
        K~=2 MXU passes per step.
    """
    out_ref = rest_refs[-1]
    layer_refs = rest_refs[:-1]

    pltpu.prng_seed(seed_ref[0], pl.program_id(0))

    x0 = x0_ref[:]  # (B, xdim) f32
    y0 = y_ref[:]  # (1, ydim) f32
    w1xy = w1xy_ref[:]  # (xdim + ydim, H1) compute_dtype
    w1t = w1t_ref[:]  # (1, H1) f32
    b1 = b1_ref[:]  # (1, H1) f32
    xdim = x0.shape[1]
    ydim = y0.shape[1]

    delta = T / num_steps
    sqrt_delta = delta**0.5
    bd = beta_max - beta_min

    def tail(h):
        for i in range(n_rest - 1):
            w = layer_refs[2 * i][:]
            b = layer_refs[2 * i + 1][:]
            acc = jax.lax.dot_general(
                h, w, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            h = jnp.tanh(acc + b).astype(compute_dtype)
        w = layer_refs[2 * (n_rest - 1)][:]
        b = layer_refs[2 * (n_rest - 1) + 1][:]
        acc = jax.lax.dot_general(
            h, w, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return acc + b  # (B, xdim) f32

    def step(i, x):
        t = (i.astype(jnp.float32) / num_steps) * T
        s = T - t
        beta_s = beta_min + bd * s
        g = jnp.sqrt(beta_s)
        # y_t = alpha(s) y0 + std(s) eps_y  (fresh noise per step)
        int_beta = 0.5 * bd * s**2 + beta_min * s
        alpha = jnp.exp(-0.5 * int_beta)
        std_s = jnp.sqrt(1.0 - jnp.exp(-int_beta))
        if noise_scale == 0.0:
            y_t = jnp.broadcast_to(alpha * y0, (x.shape[0], ydim))
            eps = None
        else:
            eps = noise_scale * _box_muller((x.shape[0], xdim + ydim))
            y_t = alpha * y0 + std_s * eps[:, xdim:]
        z = jnp.concatenate([x, y_t], axis=1)
        acc = jax.lax.dot_general(
            z.astype(compute_dtype), w1xy, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        h = jnp.tanh(acc + s * w1t + b1).astype(compute_dtype)
        a_x = tail(h)
        mu = (1.0 - 0.5 * lmbd) * g * a_x + 0.5 * beta_s * x
        if noise_scale == 0.0:
            return x + delta * mu
        sigma = (1.0 - lmbd) ** 0.5 * g
        return x + delta * mu + sqrt_delta * sigma * eps[:, :xdim]

    out_ref[:] = jax.lax.fori_loop(0, num_steps, step, x0)


def fused_em_sampler_cdiffe(
    params: Sequence[Tuple[Array, Array]],
    x0: Array,
    y: Array,
    xdim: int,
    num_steps: int = 200,
    T: float = 1.0,
    beta_min: float = 0.1,
    beta_max: float = 20.0,
    lmbd: float = 0.0,
    seed: int | Array = 0,
    block_rows: int = 1024,
    compute_dtype=jnp.bfloat16,
    noise_scale: float = 1.0,
    interpret=False,
) -> Array:
    """Fused CDiffE sampler: joint net [x, y_t, t] -> (xdim + ydim), with the
    condition re-diffused in-kernel each step and only the x block advanced.

    params: joint MLP (layer 0 consumes xdim + ydim + 1 inputs, output
    xdim + ydim); the output layer is pre-sliced to its x block here.
    """
    (w1, b1) = params[0]
    n = x0.shape[0]
    ydim = w1.shape[0] - xdim - 1

    w1xy = w1[: xdim + ydim]
    w1t = w1[xdim + ydim :].reshape(1, -1)
    y_row = jnp.asarray(y, jnp.float32).reshape(1, ydim)

    if n % block_rows != 0:
        pad = (-n) % block_rows
        x0 = jnp.pad(x0, ((0, pad), (0, 0)))
    n_padded = x0.shape[0]

    layer_specs = []
    layer_args = []
    mids = params[1:-1]
    for (w, b) in mids:
        layer_specs += [
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ]
        layer_args += [
            w.astype(compute_dtype), b.reshape(1, -1).astype(jnp.float32)
        ]
    w_out, b_out = params[-1]
    layer_specs += [
        pl.BlockSpec(memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.VMEM),
    ]
    layer_args += [
        w_out[:, :xdim].astype(compute_dtype),
        b_out[:xdim].reshape(1, -1).astype(jnp.float32),
    ]

    kernel = functools.partial(
        _em_cdiffe_kernel,
        num_steps=num_steps,
        n_rest=len(params) - 1,
        T=T,
        beta_min=beta_min,
        beta_max=beta_max,
        lmbd=lmbd,
        noise_scale=noise_scale,
        compute_dtype=compute_dtype,
    )
    full = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        grid=(n_padded // block_rows,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((block_rows, xdim), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            full(),  # y row
            full(),  # w1xy
            full(),  # w1t
            full(),  # b1
            *layer_specs,
        ],
        out_specs=pl.BlockSpec((block_rows, xdim), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_padded, xdim), jnp.float32),
        interpret=interpret,
    )(
        jnp.asarray(seed, jnp.int32).reshape(1),
        x0.astype(jnp.float32),
        y_row,
        w1xy.astype(compute_dtype),
        w1t.astype(jnp.float32),
        b1.reshape(1, -1).astype(jnp.float32),
        *layer_args,
    )
    return out[:n]


def fused_em_sampler(
    params: Sequence[Tuple[Array, Array]],
    x0: Array,
    y: Optional[Array],
    num_steps: int = 200,
    T: float = 1.0,
    beta_min: float = 0.1,
    beta_max: float = 20.0,
    lmbd: float = 0.0,
    seed: int | Array = 0,
    block_rows: int = 1024,
    compute_dtype=jnp.bfloat16,
    noise_scale: float = 1.0,
    interpret=False,
) -> Array:
    """Run the fused EM sampler.

    params: MLP (W, b) pairs, layer 0 consuming [x, y, t] (CDE layout).
    x0: (N, xdim) initial noise (draw with jax.random.normal outside).
    y: (ydim,) single condition shared by the batch, or None when the net
    has no condition block.  Returns (N, xdim) float32 samples.
    """
    (w1, b1) = params[0]
    xdim = x0.shape[-1]
    n = x0.shape[0]
    in_dim = w1.shape[0]
    ydim = in_dim - xdim - 1
    n_rest = len(params) - 1

    w1x = w1[:xdim]
    w1t = w1[xdim + ydim :].reshape(1, -1)
    if ydim > 0:
        if y is None:
            raise ValueError("net is conditional but y is None")
        w1y = w1[xdim : xdim + ydim]
        y_row = jnp.asarray(y, jnp.float32).reshape(1, ydim)
    else:
        # degenerate 1-wide condition block contributing zero
        w1y = jnp.zeros((1, w1.shape[1]), jnp.float32)
        y_row = jnp.zeros((1, 1), jnp.float32)

    if n % block_rows != 0:
        pad = (-n) % block_rows
        x0 = jnp.pad(x0, ((0, pad), (0, 0)))
    n_padded = x0.shape[0]
    grid = (n_padded // block_rows,)

    seed_arr = jnp.asarray(seed, jnp.int32).reshape(1)

    layer_specs = []
    layer_args = []
    for (w, b) in params[1:]:
        layer_specs += [
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ]
        layer_args += [
            w.astype(compute_dtype), b.reshape(1, -1).astype(jnp.float32)
        ]

    kernel = functools.partial(
        _em_kernel,
        num_steps=num_steps,
        n_rest=n_rest,
        T=T,
        beta_min=beta_min,
        beta_max=beta_max,
        lmbd=lmbd,
        noise_scale=noise_scale,
        compute_dtype=compute_dtype,
    )

    full = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # seed
            pl.BlockSpec((block_rows, xdim), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),  # x0
            full(),  # y row
            full(),  # w1x
            full(),  # w1y
            full(),  # w1t
            full(),  # b1
            *layer_specs,
        ],
        out_specs=pl.BlockSpec((block_rows, xdim), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_padded, xdim), jnp.float32),
        interpret=interpret,
    )(
        seed_arr,
        x0.astype(jnp.float32),
        y_row,
        w1x.astype(compute_dtype),
        w1y.astype(jnp.float32),
        w1t.astype(jnp.float32),
        b1.reshape(1, -1).astype(jnp.float32),
        *layer_args,
    )
    return out[:n]
