"""Conditional normalizing flows: GLOW coupling blocks, INN, and SNF.

TPU-native re-specification of the reference's FrEIA-based baselines
(models/INN.py, models/SNF.py).  The reference builds
``GLOWCouplingBlock(clamp=1.4)`` graphs via FrEIA with conditional 2-hidden-
layer ReLU subnets (models/INN.py:13-30, models/SNF.py:126-153); here the
coupling math is implemented directly with exact log-determinants:

  split x -> (x1, x2) with len1 = d // 2;
  r2 = subnet2([x2, c]);  s2, t2 = split(r2);  y1 = e(s2) * x1 + t2
  r1 = subnet1([y1, c]);  s1, t1 = split(r1);  y2 = e(s1) * x2 + t1
  log_e(s) = clamp * 0.636 * atan(s)   (FrEIA 0.2's ATAN soft clamp)
  log|det J| = sum(log_e(s1)) + sum(log_e(s2))

The SNF composes these deterministic blocks with stochastic MCMC / MALA /
Langevin layers annealing to the interpolated energy
lambd * (-log p(x|y)) + (1 - lambd) ||x||^2 / 2 (models/SNF.py:220-231),
with the stochastic kernels from :mod:`dmip_tpu.mcmc`.

Training is maximum likelihood on the inverse pass:
mean(0.5 ||z||^2 - logdet)  (models/INN.py:38-55, models/SNF.py:310-325).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, List, Optional, Tuple

import jax
import jax.numpy as jnp

from . import mcmc as M
from .nets import mlp_apply, mlp_init

Array = jax.Array

_CLAMP_GAIN = 0.636  # FrEIA's 2/pi approximation


def _log_e(s: Array, clamp: float) -> Array:
    """FrEIA 0.2 soft clamp: clamp * 0.636 * atan(s), bounded in (-clamp, clamp).

    The reference pins FrEIA==0.2 (requirements.txt:31), whose refactored
    ``_BaseCouplingBlock`` applies ``self.clamp * self.f_clamp(s)`` with
    ``f_clamp = 0.636 * atan(u)`` for the default "ATAN" activation — the
    argument is NOT pre-divided by clamp (that was the pre-0.2 form
    ``clamp * 0.636 * atan(s / clamp)``).  Parity with a vendored v0.2 torch
    mirror is asserted in tests/test_flows.py.
    """
    return clamp * _CLAMP_GAIN * jnp.arctan(s)


def subnet_init(key: Array, c_in: int, c_out: int, width: int):
    """FC subnet Linear-ReLU-Linear-ReLU-Linear (reference models/SNF.py:65-68)."""
    return mlp_init(key, c_in, c_out, (width, width))


def _subnet_apply(params, h: Array) -> Array:
    return mlp_apply(params, h, activation=jax.nn.relu)


# ---------------------------------------------------------------------------
# GLOW coupling block
# ---------------------------------------------------------------------------


def coupling_init(key: Array, d: int, cond_dim: int, width: int):
    """Params for one conditional GLOW coupling block on R^d."""
    len1, len2 = d // 2, d - d // 2
    k1, k2 = jax.random.split(key)
    return {
        "s1": subnet_init(k1, len1 + cond_dim, 2 * len2, width),
        "s2": subnet_init(k2, len2 + cond_dim, 2 * len1, width),
    }


def coupling_forward(
    params, x: Array, c: Optional[Array], d: int, clamp: float = 1.4
) -> Tuple[Array, Array]:
    len1 = d // 2
    x1, x2 = x[:, :len1], x[:, len1:]
    cc = (lambda h: h) if c is None else (lambda h: jnp.concatenate([h, c], axis=1))
    r2 = _subnet_apply(params["s2"], cc(x2))
    s2, t2 = r2[:, :len1], r2[:, len1:]
    y1 = jnp.exp(_log_e(s2, clamp)) * x1 + t2
    r1 = _subnet_apply(params["s1"], cc(y1))
    s1, t1 = r1[:, : x2.shape[1]], r1[:, x2.shape[1] :]
    y2 = jnp.exp(_log_e(s1, clamp)) * x2 + t1
    logdet = jnp.sum(_log_e(s1, clamp), axis=1) + jnp.sum(_log_e(s2, clamp), axis=1)
    return jnp.concatenate([y1, y2], axis=1), logdet


def coupling_inverse(
    params, y: Array, c: Optional[Array], d: int, clamp: float = 1.4
) -> Tuple[Array, Array]:
    len1 = d // 2
    y1, y2 = y[:, :len1], y[:, len1:]
    cc = (lambda h: h) if c is None else (lambda h: jnp.concatenate([h, c], axis=1))
    r1 = _subnet_apply(params["s1"], cc(y1))
    s1, t1 = r1[:, : y2.shape[1]], r1[:, y2.shape[1] :]
    x2 = (y2 - t1) * jnp.exp(-_log_e(s1, clamp))
    r2 = _subnet_apply(params["s2"], cc(x2))
    s2, t2 = r2[:, :len1], r2[:, len1:]
    x1 = (y1 - t2) * jnp.exp(-_log_e(s2, clamp))
    logdet = -(
        jnp.sum(_log_e(s1, clamp), axis=1) + jnp.sum(_log_e(s2, clamp), axis=1)
    )
    return jnp.concatenate([x1, x2], axis=1), logdet


# ---------------------------------------------------------------------------
# Conditional INN (stack of coupling blocks) — reference models/INN.py:13-30
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class INN:
    num_layers: int
    sub_net_size: int
    dimension: int
    dimension_condition: int
    clamp: float = 1.4

    def init(self, key: Array):
        keys = jax.random.split(key, self.num_layers)
        return [
            coupling_init(k, self.dimension, self.dimension_condition, self.sub_net_size)
            for k in keys
        ]

    def forward(self, params, x: Array, c: Array) -> Tuple[Array, Array]:
        logdet = jnp.zeros(x.shape[0], x.dtype)
        for p in params:
            x, ld = coupling_forward(p, x, c, self.dimension, self.clamp)
            logdet = logdet + ld
        return x, logdet

    def inverse(self, params, z: Array, c: Array) -> Tuple[Array, Array]:
        logdet = jnp.zeros(z.shape[0], z.dtype)
        for p in reversed(params):
            z, ld = coupling_inverse(p, z, c, self.dimension, self.clamp)
            logdet = logdet + ld
        return z, logdet

    def sample(self, params, key: Array, y: Array, n: int) -> Array:
        z = jax.random.normal(key, (n, self.dimension))
        c = jnp.broadcast_to(y, (n, self.dimension_condition))
        return self.forward(params, z, c)[0]


def create_inn(num_layers, sub_net_size, dimension=5, dimension_condition=5) -> INN:
    """Reference create_INN (models/INN.py:13-30)."""
    return INN(num_layers, sub_net_size, dimension, dimension_condition)


def inn_ml_loss(inn: INN, params, x: Array, y: Array) -> Array:
    """Maximum-likelihood loss mean(0.5||z||^2 - logdet) on the inverse pass.

    Reference train_inn_epoch (models/INN.py:38-55).
    """
    z, jac_inv = inn.inverse(params, x, y)
    return jnp.mean(0.5 * jnp.sum(z**2, axis=1) - jac_inv)


# ---------------------------------------------------------------------------
# Stochastic normalizing flow — reference models/SNF.py
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class DeterministicLayer:
    """num_inn_layers coupling blocks (reference deterministic_layer,
    models/SNF.py:126-153)."""

    num_inn_layers: int
    sub_net_size: int
    dimension: int
    dimension_condition: int
    clamp: float = 1.4

    def init(self, key: Array):
        keys = jax.random.split(key, self.num_inn_layers)
        return [
            coupling_init(k, self.dimension, self.dimension_condition, self.sub_net_size)
            for k in keys
        ]

    def forward(self, params, key, x, ys):
        logdet = jnp.zeros(x.shape[0], x.dtype)
        for p in params:
            x, ld = coupling_forward(p, x, ys, self.dimension, self.clamp)
            logdet = logdet + ld
        return x, logdet

    def backward(self, params, key, x, ys):
        logdet = jnp.zeros(x.shape[0], x.dtype)
        for p in reversed(params):
            x, ld = coupling_inverse(p, x, ys, self.dimension, self.clamp)
            logdet = logdet + ld
        return x, logdet


@dataclasses.dataclass(frozen=True)
class MCMCLayer:
    """Metropolis layer annealing to the interpolated energy
    (models/SNF.py:161-173)."""

    lambd: float
    noise_std: float
    metr_steps_per_block: int

    def init(self, key):
        return ()

    def forward(self, params, key, x, ys, energy_fn):
        energy = M.interpolated_energy(ys, self.lambd, energy_fn)
        return M.anneal_to_energy(
            key, x, energy, self.metr_steps_per_block, noise_std=self.noise_std
        )

    backward = forward


@dataclasses.dataclass(frozen=True)
class MALALayer:
    """MCMC with Langevin proposals (models/SNF.py:183-197); the reference
    divides the stepsize by lambd."""

    lambd: float
    metr_steps_per_block: int
    lang_steps: int
    stepsize: float

    def init(self, key):
        return ()

    def forward(self, params, key, x, ys, energy_fn):
        energy = M.interpolated_energy(ys, self.lambd, energy_fn)
        z, e = M.anneal_to_energy(
            key, x, energy, self.metr_steps_per_block,
            langevin_prop=True, lang_steps=self.lang_steps,
            stepsize=self.stepsize / self.lambd,
        )
        return z, e

    backward = forward


@dataclasses.dataclass(frozen=True)
class LangevinLayer:
    """Unadjusted Langevin layer with log-det correction (models/SNF.py:205-216)."""

    lambd: float
    lang_steps: int
    stepsize: float

    def init(self, key):
        return ()

    def forward(self, params, key, x, ys, energy_fn):
        energy = M.interpolated_energy(ys, self.lambd, energy_fn)
        z, log_det, _, _ = M.langevin_step(key, x, self.stepsize, energy, self.lang_steps)
        return z, log_det

    backward = forward


@dataclasses.dataclass(frozen=True)
class SNF:
    """Alternating deterministic / stochastic layers (models/SNF.py:72-115).

    ``energy_fn(x, ys) -> (n,)`` is the problem's negative log posterior;
    stochastic layers interpolate it against the standard-normal energy.
    """

    layers: Tuple[Any, ...]
    energy_fn: Optional[Callable[[Array, Array], Array]] = None

    def init(self, key: Array):
        keys = jax.random.split(key, max(len(self.layers), 1))
        return [l.init(k) for l, k in zip(self.layers, keys)]

    def _apply(self, params, key, zs, ys, direction: str):
        logdet = jnp.zeros(zs.shape[0], zs.dtype)
        order = range(len(self.layers))
        if direction == "backward":
            order = reversed(order)
        for i in order:
            layer = self.layers[i]
            key, k = jax.random.split(key)
            fn = layer.forward if direction == "forward" else layer.backward
            if isinstance(layer, DeterministicLayer):
                zs, ld = fn(params[i], k, zs, ys)
            else:
                zs, ld = fn(params[i], k, zs, ys, self.energy_fn)
            logdet = logdet + ld
        return zs, logdet

    def forward(self, params, key: Array, zs: Array, ys: Array):
        return self._apply(params, key, zs, ys, "forward")

    def forward_all(self, params, key: Array, zs: Array, ys: Array):
        """Forward pass returning the sample path after every layer
        (reference SNF.forward_all, models/SNF.py:98-105)."""
        outs = [zs]
        for i, layer in enumerate(self.layers):
            key, k = jax.random.split(key)
            if isinstance(layer, DeterministicLayer):
                zs, _ = layer.forward(params[i], k, zs, ys)
            else:
                zs, _ = layer.forward(params[i], k, zs, ys, self.energy_fn)
            outs.append(zs)
        return outs

    def backward(self, params, key: Array, zs: Array, ys: Array):
        return self._apply(params, key, zs, ys, "backward")

    def sample(self, params, key: Array, y: Array, n: int) -> Array:
        kz, kf = jax.random.split(key)
        d = self.layers[0].dimension
        cdim = self.layers[0].dimension_condition
        z = jax.random.normal(kz, (n, d))
        ys = jnp.broadcast_to(y, (n, cdim))
        return self.forward(params, kf, z, ys)[0]


def create_snf(
    num_layers: int,
    sub_net_size: int,
    energy_fn: Callable[[Array, Array], Array],
    metr_steps_per_block: int = 3,
    dimension_condition: int = 5,
    dimension: int = 5,
    noise_std: float = 0.4,
    num_inn_layers: int = 1,
    lang_steps: int = 0,
    lang_steps_prop: int = 1,
    step_size: float = 5e-3,
    langevin_prop: bool = False,
) -> SNF:
    """Builder mirroring reference create_snf (models/SNF.py:32-46)."""
    layers: List[Any] = []
    for k in range(num_layers):
        lambd = (k + 1) / num_layers
        layers.append(
            DeterministicLayer(
                num_inn_layers, sub_net_size, dimension, dimension_condition
            )
        )
        if metr_steps_per_block > 0:
            if lang_steps > 0:
                layers.append(LangevinLayer(lambd, lang_steps, step_size))
            if langevin_prop:
                layers.append(
                    MALALayer(lambd, metr_steps_per_block, lang_steps_prop, step_size)
                )
            else:
                layers.append(MCMCLayer(lambd, noise_std, metr_steps_per_block))
    return SNF(tuple(layers), energy_fn)


def create_snf_last_layer(
    num_layers: int,
    sub_net_size: int,
    energy_fn: Callable[[Array, Array], Array],
    metr_steps_per_block: int = 3,
    dimension_condition: int = 5,
    dimension: int = 5,
    noise_std: float = 0.4,
    num_inn_layers: int = 1,
    lang_steps: int = 0,
    lang_steps_prop: int = 1,
    step_size: float = 5e-3,
    langevin_prop: bool = False,
) -> SNF:
    """Variant with stochastic layers only after the last deterministic block
    (reference create_snf_last_layer, models/SNF.py:49-63)."""
    layers: List[Any] = []
    lambd = 1.0
    for k in range(num_layers):
        lambd = (k + 1) / num_layers
        layers.append(
            DeterministicLayer(
                num_inn_layers, sub_net_size, dimension, dimension_condition
            )
        )
    if metr_steps_per_block > 0:
        if lang_steps > 0:
            layers.append(LangevinLayer(lambd, lang_steps, step_size))
        if langevin_prop:
            layers.append(
                MALALayer(lambd, metr_steps_per_block, lang_steps_prop, step_size)
            )
        else:
            layers.append(MCMCLayer(lambd, noise_std, metr_steps_per_block))
    return SNF(tuple(layers), energy_fn)


def snf_ml_loss(snf: SNF, params, key: Array, x: Array, y: Array) -> Array:
    """mean(0.5||z||^2 - logdet) on the backward pass (models/SNF.py:310-325)."""
    z, jac_inv = snf.backward(params, key, x, y)
    return jnp.mean(0.5 * jnp.sum(z**2, axis=1) - jac_inv)
