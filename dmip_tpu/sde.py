"""Variance-preserving SDE core (TPU-native, pure-functional JAX).

Re-specifies the behavior of the reference's ``sdes.py`` (reference:
sdes.py:9-57 ``VariancePreservingSDE`` and sdes.py:60-126 ``PluginReverseSDE``)
as closed-form pure functions on a frozen dataclass.  Everything here is
shape-static, jittable, and differentiable to arbitrary order (the ScoreFPE
losses take second derivatives through these closed forms).

Differences from the reference (deliberate, TPU-first):
  * No module state / no implicit global RNG: marginal sampling takes an
    explicit PRNG key.
  * The debiased t-sampler (reference: sdes.py:51-57, vendored
    ``sample_vp_truncated_q`` from sdeflow-light) is re-derived in closed form
    below (:func:`sample_debiasing_t`) instead of being imported.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp

Array = jax.Array


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class VPSDE:
    """Variance-preserving forward SDE, Song et al. 2021 eq. (32-33).

    beta(t)        = beta_min + (beta_max - beta_min) * t
    mean_weight(t) = exp(-1/4 t^2 (beta_max-beta_min) - 1/2 t beta_min)
    var(t)         = 1 - mean_weight(t)^2
    f(t, y)        = -1/2 beta(t) y            (drift)
    g(t)           = sqrt(beta(t))             (diffusion)

    Matches reference sdes.py:14-35 with identical defaults.
    """

    beta_min: float = dataclasses.field(default=0.1, metadata=dict(static=True))
    beta_max: float = dataclasses.field(default=20.0, metadata=dict(static=True))
    T: float = dataclasses.field(default=1.0, metadata=dict(static=True))
    t_epsilon: float = dataclasses.field(default=0.001, metadata=dict(static=True))

    # -- closed forms ------------------------------------------------------
    def beta(self, t: Array) -> Array:
        return self.beta_min + (self.beta_max - self.beta_min) * t

    def int_beta(self, t: Array) -> Array:
        """B(t) = \\int_0^t beta(s) ds = 1/2 (beta_max-beta_min) t^2 + beta_min t."""
        return 0.5 * (self.beta_max - self.beta_min) * t**2 + self.beta_min * t

    def mean_weight(self, t: Array) -> Array:
        # exp(-B(t)/2); reference sdes.py:24-25
        return jnp.exp(-0.5 * self.int_beta(t))

    def var(self, t: Array) -> Array:
        # 1 - exp(-B(t)); reference sdes.py:27-28
        return 1.0 - jnp.exp(-self.int_beta(t))

    def std(self, t: Array) -> Array:
        return jnp.sqrt(self.var(t))

    def f(self, t: Array, y: Array) -> Array:
        return -0.5 * self.beta(t) * y

    def g(self, t: Array) -> Array:
        """Scalar diffusion coefficient sqrt(beta(t)).

        The reference returns ``ones_like(y) * beta^0.5`` (sdes.py:33-35);
        here g broadcasts naturally, so we return the scalar/batched value.
        """
        return jnp.sqrt(self.beta(t))

    # -- marginal sampling -------------------------------------------------
    def marginal_sample(
        self, key: Array, t: Array, y0: Array
    ) -> Tuple[Array, Array, Array, Array]:
        """Sample y_t | y_0 in closed form (reference sdes.py:37-49).

        Returns (y_t, epsilon, std, g) for DSM-loss reweighting, with
        y_t = mean_weight(t) * y0 + std(t) * epsilon.
        """
        mu = self.mean_weight(t) * y0
        std = self.std(t)
        epsilon = jax.random.normal(key, y0.shape, y0.dtype)
        yt = epsilon * std + mu
        return yt, epsilon, std, self.g(t) * jnp.ones_like(y0)

    def diffuse(self, t: Array, y0: Array, epsilon: Array) -> Array:
        """Deterministic reparametrized diffusion given the noise.

        Used by the PDE losses, where y_t must remain a differentiable
        function of t (the reference achieves this with
        ``t.requires_grad=True`` before sampling; models/diffusion.py:48-58).
        """
        return self.mean_weight(t) * y0 + self.std(t) * epsilon

    # -- debiased t sampling ----------------------------------------------
    def sample_debiasing_t(self, key: Array, shape) -> Array:
        """Sample t with density proportional to g^2(t)/var(t) on [t_epsilon, T].

        Re-derivation of the vendored ``sample_vp_truncated_q``
        (reference sdes.py:51-57):  with B(t)=\\int_0^t beta, the unnormalized
        density q(t) = beta(t) / (1 - e^{-B(t)}) has antiderivative
        Q(t) = log(e^{B(t)} - 1).  Inverting u = Q(t) gives
        B(t) = softplus(u), a quadratic in t solved in closed form.
        Sampling u ~ U(Q(t_eps), Q(T)) yields exact inverse-CDF samples.
        """
        u0 = self._Q(jnp.asarray(self.t_epsilon))
        u1 = self._Q(jnp.asarray(self.T))
        u = jax.random.uniform(key, shape, minval=0.0, maxval=1.0)
        u = u0 + (u1 - u0) * u
        b = jax.nn.softplus(u)  # = B(t)
        bd = self.beta_max - self.beta_min
        # Solve 1/2 bd t^2 + beta_min t - b = 0 for t >= 0.
        t = (-self.beta_min + jnp.sqrt(self.beta_min**2 + 2.0 * bd * b)) / bd
        return jnp.clip(t, self.t_epsilon, self.T)

    def _Q(self, t: Array) -> Array:
        """Unnormalized CDF of the debiasing density: log(e^{B(t)} - 1)."""
        b = self.int_beta(t)
        # log(expm1(b)) computed stably: b + log1p(-exp(-b))
        return b + jnp.log1p(-jnp.exp(-b))


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class ReverseSDE:
    """Plug-in reverse SDE (reference sdes.py:60-126).

    Given the base (forward) SDE with drift f and diffusion g and a learned
    drift ``a(x, cond, t)`` (the net predicts g * score), the reverse process
    run forward in a new time variable t in [0, T] has

      mu(t, x, cond)  = (1 - lmbd/2) g(T-t) a(x, cond, T-t) - f(T-t, x)
      sigma(t)        = sqrt(1 - lmbd) g(T-t)

    This dataclass only carries static config; the drift function and its
    parameters are passed explicitly so the whole object stays a pytree of
    metadata (functional style; no nn.Module state).
    """

    base: VPSDE = dataclasses.field(default_factory=VPSDE, metadata=dict(static=True))
    T: float = dataclasses.field(default=1.0, metadata=dict(static=True))
    debias: bool = dataclasses.field(default=True, metadata=dict(static=True))

    def mu(
        self,
        drift_a: Callable[[Array, Optional[Array], Array], Array],
        t: Array,
        x: Array,
        cond: Optional[Array],
        lmbd: float = 0.0,
    ) -> Array:
        s = self.T - t
        return (1.0 - 0.5 * lmbd) * self.base.g(s) * drift_a(x, cond, s) - self.base.f(
            s, x
        )

    def sigma(self, t: Array, lmbd: float = 0.0) -> Array:
        return jnp.sqrt(1.0 - lmbd) * self.base.g(self.T - t)


def log_normal(x: Array, mean: Array, log_var: Array) -> Array:
    """Elementwise Gaussian log density (vendored sdeflow-light helper used
    by the ELBO estimator; reference sdes.py:6,124)."""
    return -0.5 * (
        jnp.log(2.0 * jnp.pi) + log_var + (x - mean) ** 2 / jnp.exp(log_var)
    )


def sample_v(key: Array, shape, vtype: str = "rademacher") -> Array:
    """Hutchinson probe vectors (vendored sdeflow-light ``sample_v``)."""
    if vtype == "rademacher":
        return jax.random.rademacher(key, shape, jnp.float32)
    if vtype in ("normal", "gaussian"):
        return jax.random.normal(key, shape)
    raise ValueError(f"unknown vtype {vtype!r}")


def reverse_sde_dsm(
    sde: ReverseSDE,
    apply_a: Callable[..., Array],
    params,
    key: Array,
    x: Array,
    cond: Optional[Array],
) -> Array:
    """Per-sample DSM loss of the plug-in reverse SDE.

    Reference PluginReverseSDE.dsm (sdes.py:89-101).  DOCUMENTED DIVERGENCE:
    the reference passes ``(y, t_, cond)`` to a net whose signature is
    (x, y, t) (SURVEY.md §2.3.5, dead code in the mains); here the argument
    order is corrected to a(y_t, cond, t).
    """
    kt, keps = jax.random.split(key)
    batch = x.shape[0]
    if sde.debias:
        t = sde.base.sample_debiasing_t(kt, (batch, 1))
    else:
        t = jax.random.uniform(kt, (batch, 1)) * sde.T
    eps = jax.random.normal(keps, x.shape, x.dtype)
    y_t = sde.base.diffuse(t, x, eps)
    std = sde.base.std(t)
    g = sde.base.g(t)
    a = apply_a(params, y_t, cond, t)
    return 0.5 * jnp.sum((a * std / g + eps) ** 2, axis=1)


def elbo_random_t_slice(
    sde: ReverseSDE,
    apply_a: Callable[..., Array],
    params,
    key: Array,
    x: Array,
    cond: Optional[Array] = None,
    vtype: str = "rademacher",
) -> Array:
    """Single-t-slice ELBO estimate of the plug-in reverse SDE.

    Reference PluginReverseSDE.elbo_random_t_slice (sdes.py:103-126):
    t ~ U(0,T); y_t sampled from the marginal; div(mu) by a Hutchinson
    vector-Jacobian probe; prior term log N(y_T; 0, I).
    """
    kt, ky, kv, kT = jax.random.split(key, 4)
    batch = x.shape[0]
    t = jax.random.uniform(kt, (batch, 1)) * sde.T
    qt = 1.0 / sde.T
    eps = jax.random.normal(ky, x.shape, x.dtype)
    y = sde.base.diffuse(t, x, eps)
    v = sample_v(kv, x.shape, vtype)

    def mu_fn(y_in):
        a = apply_a(params, y_in, cond, t)
        return sde.base.g(t) * a - sde.base.f(t, y_in)

    a_val = apply_a(params, y, cond, t)
    _, vjp = jax.vjp(mu_fn, y)
    mu_div_probe = jnp.sum(vjp(v)[0] * v, axis=1)
    Mu = -mu_div_probe / qt
    Nu = -0.5 * jnp.sum(a_val**2, axis=1) / qt

    epsT = jax.random.normal(kT, x.shape, x.dtype)
    yT = sde.base.diffuse(jnp.full((batch, 1), sde.base.T), x, epsT)
    lp = jnp.sum(
        log_normal(yT, jnp.zeros_like(yT), jnp.zeros_like(yT)), axis=1
    )
    return lp + Mu + Nu


def sample_t(
    sde: ReverseSDE, key: Array, batch: int, eps: float = 1e-4
) -> Array:
    """Sample per-example diffusion times, shape (batch, 1).

    Mirrors ``BaseClassDiffusionModel.sample_t`` (models/diffusion.py:48-58):
    debiased sampling shifted by eps and clamped to <= T, or uniform on
    [eps, T] with values above T mapped to T - eps.  The eps floor avoids the
    gradient explosion of the PDE losses for t ~ 1e-7 noted in the reference.
    """
    if sde.debias:
        t = sde.base.sample_debiasing_t(key, (batch, 1)) + eps
        t = jnp.where(t > sde.T, t - eps, t)
    else:
        t = eps + jax.random.uniform(key, (batch, 1)) * sde.T
        t = jnp.where(t > sde.T, sde.T - eps, t)
    return t
