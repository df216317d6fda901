"""Pallas TPU kernel: fused Metropolis-Hastings for the scatterometry energy.

Ground-truth generation (SURVEY.md §3.5) runs 30k parallel Metropolis chains
for 1000 steps, evaluating the surrogate-MLP posterior energy every step —
the reference fans this out over 4 joblib CPU processes for hours.  The XLA
scan version runs fast on TPU but its compile takes many minutes on this
image (and the compiler SIGILLs on large flat batches).  This kernel fuses
the whole chain loop on-chip:

  * surrogate weights (3 -> 256 -> 256 -> 256 -> 23, ReLU) resident in VMEM;
  * chains tiled over a 1-D grid;
  * per step: Gaussian proposal, energy  0.5 sum log((a f)^2 + b^2)
    + 0.5 sum (y - f)^2 / ((a f)^2 + b^2) + lambd_bd * boundary relu,
    branchless accept/reject with carried current energy;
  * proposal + acceptance randomness from the in-kernel TPU PRNG
    (Box-Muller / uniform), seeded per (seed, program).

Semantics match mcmc.anneal_to_energy with a Gaussian proposal (reference
models/SNF.py:250-275); the accepted-energy carry is the same documented
optimization used there.
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .em_kernel import _box_muller, _uniform_from_bits

Array = jax.Array


def _mh_kernel(
    seed_ref,
    x0_ref,
    y_ref,
    *w_refs,
    num_steps: int,
    n_layers: int,
    noise_std: float,
    a: float,
    b: float,
    lambd_bd: float,
    compute_dtype,
):
    out_ref = w_refs[-1]
    layer_refs = w_refs[:-1]

    pltpu.prng_seed(seed_ref[0], pl.program_id(0))
    x0 = x0_ref[:]  # (B, xdim) f32
    y = y_ref[:]  # (1, ydim) f32

    def energy(x):
        h = x.astype(compute_dtype)
        for i in range(n_layers - 1):
            w = layer_refs[2 * i][:]
            bias = layer_refs[2 * i + 1][:]
            acc = jax.lax.dot_general(
                h, w, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            h = jnp.maximum(acc + bias, 0.0).astype(compute_dtype)
        w = layer_refs[2 * (n_layers - 1)][:]
        bias = layer_refs[2 * (n_layers - 1) + 1][:]
        f = (
            jax.lax.dot_general(
                h, w, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            + bias
        )  # (B, ydim) f32
        prefactor = (a * f) ** 2 + b * b
        p1 = 0.5 * jnp.sum(jnp.log(prefactor), axis=1, keepdims=True)
        p2 = 0.5 * jnp.sum((y - f) ** 2 / prefactor, axis=1, keepdims=True)
        p3 = lambd_bd * jnp.sum(
            jnp.maximum(x - 1.0, 0.0) + jnp.maximum(-1.0 - x, 0.0),
            axis=1, keepdims=True,
        )
        return p1 + p2 + p3  # (B, 1)

    e0 = energy(x0)

    def step(_, carry):
        x, e = carry
        noise = noise_std * _box_muller(x.shape)
        x_prop = x + noise
        e_prop = energy(x_prop)
        u = _uniform_from_bits(
            pltpu.bitcast(pltpu.prng_random_bits(e.shape), jnp.uint32)
        )
        acc = u < jnp.exp(e - e_prop)
        x = jnp.where(acc, x_prop, x)
        e = jnp.where(acc, e_prop, e)
        return (x, e)

    x_fin, _ = jax.lax.fori_loop(0, num_steps, step, (x0, e0))
    out_ref[:] = x_fin


def fused_mh_scatterometry(
    surrogate_params: Sequence[Tuple[Array, Array]],
    x0: Array,
    y: Array,
    num_steps: int,
    noise_std: float = 0.5,
    a: float = 0.2,
    b: float = 0.01,
    lambd_bd: float = 1000.0,
    seed: int | Array = 0,
    block_rows: int = 512,
    compute_dtype=jnp.float32,
    interpret=False,
) -> Array:
    """Metropolis annealing to the scatterometry posterior, fully on-chip.

    surrogate_params: the frozen forward model's (W, b) pairs.
    x0: (N, 3) chain initializations; y: (23,) observation.
    Returns (N, 3) float32 final chain states.
    """
    n, xdim = x0.shape
    ydim = y.shape[-1]
    if n % block_rows != 0:
        pad = (-n) % block_rows
        x0 = jnp.pad(x0, ((0, pad), (0, 0)))
    n_padded = x0.shape[0]

    w_args = []
    w_specs = []
    for (w, bias) in surrogate_params:
        w_args += [
            w.astype(compute_dtype),
            bias.reshape(1, -1).astype(jnp.float32),
        ]
        w_specs += [
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ]

    kernel = functools.partial(
        _mh_kernel,
        num_steps=num_steps,
        n_layers=len(surrogate_params),
        noise_std=noise_std,
        a=a,
        b=b,
        lambd_bd=lambd_bd,
        compute_dtype=compute_dtype,
    )
    out = pl.pallas_call(
        kernel,
        grid=(n_padded // block_rows,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((block_rows, xdim), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            *w_specs,
        ],
        out_specs=pl.BlockSpec((block_rows, xdim), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_padded, xdim), jnp.float32),
        interpret=interpret,
    )(
        jnp.asarray(seed, jnp.int32).reshape(1),
        x0.astype(jnp.float32),
        jnp.asarray(y, jnp.float32).reshape(1, ydim),
        *w_args,
    )
    return out[:n]
