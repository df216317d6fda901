"""MCMC kernels: Metropolis-Hastings, MALA, and unadjusted Langevin.

TPU-native re-specification of the reference's stochastic-layer kernels
(models/SNF.py:234-300: ``energy_grad``, ``anneal_to_energy``,
``langevin_step``).  Each kernel is a branchless ``lax.scan`` over steps with
all chains advanced in parallel (vmap-free: energies are batched), suitable
for jit + sharding over chains/conditions.  This also powers the ground-truth
generator (generate_scatterometry_ground_truth.py:26-63), replacing joblib
CPU fan-out with device-sharded chains.

An ``energy`` is a batched callable (n, d) -> (n,) returning the NEGATIVE log
density (the reference's convention: get_log_posterior returns -log p).
"""

from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp

Array = jax.Array
EnergyFn = Callable[[Array], Array]


def energy_grad(x: Array, energy: EnergyFn) -> Tuple[Array, Array]:
    """(grad of energy, per-sample energy) at x — reference models/SNF.py:234-237.

    One forward + one backward pass (the per-sample energies ride along as
    aux), vs the reference's separate evaluations.
    """
    def summed(z):
        e = energy(z)
        return jnp.sum(e), e

    (_, e), grad = jax.value_and_grad(summed, has_aux=True)(x)
    return grad, e


def _energy_with_grad(x: Array, energy: EnergyFn) -> Tuple[Array, Array]:
    grad, e = energy_grad(x, energy)
    return grad, e


def langevin_step(
    key: Array,
    x: Array,
    stepsize: float,
    energy: EnergyFn,
    lang_steps: int,
    beta: float = 1.0,
) -> Tuple[Array, Array, Array, Array]:
    """Unadjusted Langevin trajectory with proposal log-det accumulation.

    Mirrors models/SNF.py:286-300.  Returns (x_final, log_det, energy at the
    initial point, energy at the final point); log_det is the accumulated
    0.5 * (eta^2 - eta_tilde^2) forward/backward noise correction used by the
    MALA acceptance ratio and the SNF Langevin layer.
    """
    scale = jnp.sqrt(2.0 * stepsize / beta)

    def body(carry, k):
        x, log_det, e_first, first = carry
        eta = jax.random.normal(k, x.shape, x.dtype)
        grad_x, e_x = _energy_with_grad(x, energy)
        e_first = jnp.where(first, e_x, e_first)
        y = x - stepsize * grad_x + scale * eta
        grad_y, e_y = _energy_with_grad(y, energy)
        eta_back = (x - y + stepsize * grad_y) / scale
        log_det = log_det + 0.5 * jnp.sum(eta**2 - eta_back**2, axis=1)
        return (y, log_det, e_first, jnp.zeros_like(first)), e_y

    keys = jax.random.split(key, lang_steps)
    init = (
        x,
        jnp.zeros(x.shape[0], x.dtype),
        jnp.zeros(x.shape[0], x.dtype),
        jnp.ones((), bool),
    )
    (x_out, log_det, e_first, _), e_ys = jax.lax.scan(body, init, keys)
    return x_out, log_det, e_first, e_ys[-1]


def anneal_to_energy(
    key: Array,
    x_curr: Array,
    energy: EnergyFn,
    metr_steps_per_block: int,
    noise_std: float = 0.1,
    langevin_prop: bool = False,
    lang_steps: int | None = None,
    stepsize: float | None = None,
) -> Tuple[Array, Array]:
    """Metropolis-Hastings annealing to ``energy`` — models/SNF.py:250-275.

    Gaussian random-walk proposals by default; Langevin (MALA) proposals when
    ``langevin_prop``.  Returns (x_final, e_final - e_initial) where e_final
    is the blended accepted/rejected energy of the LAST step (the reference's
    'logdet' for the SNF stochastic layers).
    """
    e0 = energy(x_curr)

    def step(carry, k):
        x, e_carried = carry
        if langevin_prop:
            kl, ka = jax.random.split(k)
            x_prop, log_det, e_curr, e_prop = langevin_step(
                kl, x, stepsize, energy, lang_steps
            )
            log_ratio = -e_prop + e_curr + log_det
        else:
            kn, ka = jax.random.split(k)
            noise = noise_std * jax.random.normal(kn, x.shape, x.dtype)
            x_prop = x + noise
            e_prop = energy(x_prop)
            # the reference recomputes energy(x) every step
            # (models/SNF.py:261); carrying the accepted energy is
            # distribution-identical and halves the forward-model evals.
            e_curr = e_carried
            log_ratio = -e_prop + e_curr
        # r < exp(log_ratio), branchless (reference models/SNF.py:263-269)
        r = jax.random.uniform(ka, e_prop.shape, x.dtype)
        acc = (r < jnp.exp(log_ratio)).astype(x.dtype)
        x_next = (1.0 - acc)[:, None] * x + acc[:, None] * x_prop
        e_next = (1.0 - acc) * e_curr + acc * e_prop
        return (x_next, e_next), None

    keys = jax.random.split(key, metr_steps_per_block)
    (x_out, e_out), _ = jax.lax.scan(step, (x_curr, e0), keys)
    return x_out, e_out - e0


def annealed_mh(
    key: Array,
    x_curr: Array,
    energy: EnergyFn,
    steps: int,
    noise_std: float = 0.1,
    lambda0: float = 1.0,
    lambda1: float = 1.0,
    target_acc: float | None = None,
    adapt_rate: float = 1.0,
    anneal_frac: float = 1.0,
) -> Tuple[Array, dict]:
    """Random-walk MH chain whose target ANNEALS through the interpolated
    energies ``lam * E(x) + (1 - lam) * ||x||^2 / 2`` — the SNF stochastic
    layers' own schedule (reference models/SNF.py:220-231), here applied
    within one chain: ``lam`` runs linearly from ``lambda0`` to ``lambda1``
    across the steps.  ``lambda1 < 1`` is TEMPERED refinement: the chain's
    final target blends the posterior with the standard-normal prior,
    leaving the population slightly over-dispersed — the controlled analog
    of the SNF sampler's own residual bias (its finite chains never fully
    reach lam=1 stationarity either).  ``lambda0=lambda1=1.0`` degenerates
    to a fixed-target chain equivalent in distribution to
    :func:`anneal_to_energy`.

    ``anneal_frac < 1`` is ANNEAL-THEN-POLISH: the ramp runs over the first
    ``round(anneal_frac * steps)`` steps only, after which the remaining
    steps hold the FINAL target (``lambda1``).  This probes the trade-off
    between the annealed schedule's forward-histogram-KL win (early
    wide-target steps keep the population slightly smoother) and the
    fixed-target chain's NLPD/W2 fidelity (late exact-target steps restore
    it) — see BENCHMARKS.md's round-4 anneal trade-off section.
    ``anneal_frac=1.0`` is the plain linear schedule.

    ``target_acc`` (e.g. 0.4) turns on per-call proposal adaptation: after
    every step the shared log proposal-std moves by
    ``adapt_rate / (t + 1) * (acc_rate - target_acc)`` (diminishing
    Robbins-Monro adaptation; with 30k parallel chains the per-step
    acceptance-rate estimate is essentially noise-free, so a handful of
    steps suffices to land near the target).  The adapted std is shared by
    the whole population — a per-CONDITION tuning knob, since each call
    refines one condition's population.

    Both posterior and prior energies are carried so each step costs one
    posterior-energy evaluation, like :func:`anneal_to_energy`'s
    carried-energy optimization (the lam-blend is recomputed per step from
    the carried components).

    Returns ``(x_final, info)`` with ``info['acc_rate']`` the per-step mean
    acceptance (steps,) and ``info['noise_std']`` the final proposal std.
    """
    e_post = energy(x_curr)
    e_prior = 0.5 * jnp.sum(x_curr**2, axis=1)
    n_ramp = max(2, round(anneal_frac * steps)) if steps > 1 else steps
    if steps > 1 and n_ramp < steps:
        lambdas = jnp.concatenate([
            jnp.linspace(lambda0, lambda1, n_ramp),
            jnp.full((steps - n_ramp,), lambda1),
        ]).astype(x_curr.dtype)
    else:
        lambdas = (
            jnp.linspace(lambda0, lambda1, steps)
            if steps > 1
            else jnp.full((steps,), lambda1, x_curr.dtype)
        )

    def step(carry, inp):
        k, lam, t = inp
        x, e_post, e_prior, log_std = carry
        kn, ka = jax.random.split(k)
        sigma = jnp.exp(log_std)
        x_prop = x + sigma * jax.random.normal(kn, x.shape, x.dtype)
        ep_prop = energy(x_prop)
        epr_prop = 0.5 * jnp.sum(x_prop**2, axis=1)
        log_ratio = (lam * e_post + (1.0 - lam) * e_prior) - (
            lam * ep_prop + (1.0 - lam) * epr_prop
        )
        r = jax.random.uniform(ka, ep_prop.shape, x.dtype)
        acc = (r < jnp.exp(log_ratio)).astype(x.dtype)
        x_next = (1.0 - acc)[:, None] * x + acc[:, None] * x_prop
        e_post_next = (1.0 - acc) * e_post + acc * ep_prop
        e_prior_next = (1.0 - acc) * e_prior + acc * epr_prop
        acc_rate = jnp.mean(acc)
        if target_acc is not None:
            log_std = log_std + adapt_rate / (t + 1.0) * (acc_rate - target_acc)
        return (x_next, e_post_next, e_prior_next, log_std), acc_rate

    keys = jax.random.split(key, steps)
    init = (x_curr, e_post, e_prior,
            jnp.asarray(jnp.log(noise_std), x_curr.dtype))
    (x_out, _, _, log_std), acc_rates = jax.lax.scan(
        step, init, (keys, lambdas, jnp.arange(steps, dtype=x_curr.dtype))
    )
    return x_out, {"acc_rate": acc_rates, "noise_std": jnp.exp(log_std)}


def interpolated_energy(
    ys: Array, lambd: float, neg_log_posterior: Callable[[Array, Array], Array]
) -> EnergyFn:
    """lambd * (-log p(x|y)) + (1 - lambd) * ||x||^2 / 2 — models/SNF.py:220-231."""
    if lambd == 0.0:
        return lambda x: 0.5 * jnp.sum(x**2, axis=1)
    if lambd == 1.0:
        return lambda x: neg_log_posterior(x, ys)
    return lambda x: lambd * neg_log_posterior(x, ys) + (1.0 - lambd) * 0.5 * jnp.sum(
        x**2, axis=1
    )
