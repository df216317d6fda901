"""Reverse-SDE posterior samplers: jitted Euler-Maruyama scan kernels.

The reference's inference hot path (models/diffusion.py:27-46) is a Python
loop moving one condition y at a time: 200 steps x 30k-sample batches of the
score MLP.  Here the whole sampler is one ``lax.scan`` under ``jit``, vmapped
over conditions and shardable over a device mesh along the condition/sample
axes — the north-star workload of SURVEY.md §3.2.

Time grid parity: the reference uses ts[i] = i/num_steps * T for
i = 0..num_steps-1 and step size delta = T/num_steps, updating
x <- x + delta * mu(t_i, x, y) + sqrt(delta) * sigma(t_i) * xi.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp

from .sde import ReverseSDE

Array = jax.Array


def euler_maruyama(
    sde: ReverseSDE,
    drift_a: Callable[[Array, Optional[Array], Array], Array],
    key: Array,
    y: Optional[Array],
    num_samples: int,
    xdim: int,
    num_steps: int = 200,
    mean: float = 0.0,
    std: float = 1.0,
    lmbd: float = 0.0,
    dtype=jnp.float32,
    noise_scale: float = 1.0,
) -> Array:
    """Integrate the plug-in reverse SDE from x0 ~ N(mean, std^2).

    ``noise_scale=0`` turns the integrator deterministic (testing hook for
    exact parity against the fused Pallas kernel).

    drift_a(x, cond, s) is the learned drift (params already closed over);
    ``y`` of shape (ydim,) is tiled over the sample batch (reference
    models/diffusion.py:29-30), or None for unconditional sampling.
    Returns (num_samples, xdim).
    """
    k0, kscan = jax.random.split(key)
    x0 = jax.random.normal(k0, (num_samples, xdim), dtype) * std + mean
    cond = None
    if y is not None:
        cond = jnp.broadcast_to(y.astype(dtype), (num_samples, y.shape[-1]))
    delta = sde.T / num_steps
    ts = (jnp.arange(num_steps, dtype=dtype) / num_steps) * sde.T

    def step(x, inp):
        t_i, k = inp
        t_col = jnp.full((num_samples, 1), t_i, dtype)
        mu = sde.mu(lambda xx, cc, ss: drift_a(xx, cc, ss), t_col, x, cond, lmbd)
        sigma = sde.sigma(t_col, lmbd)
        noise = noise_scale * jax.random.normal(k, x.shape, dtype)
        x_next = x + delta * mu + jnp.sqrt(delta) * sigma * noise
        return x_next.astype(dtype), None

    keys = jax.random.split(kscan, num_steps)
    x_final, _ = jax.lax.scan(step, x0, (ts, keys))
    return x_final


def euler_maruyama_cdiffe(
    sde: ReverseSDE,
    drift_a: Callable[[Array, Optional[Array], Array], Array],
    key: Array,
    y: Array,
    num_samples: int,
    xdim: int,
    num_steps: int = 200,
    mean: float = 0.0,
    std: float = 1.0,
    lmbd: float = 0.0,
    dtype=jnp.float32,
    noise_scale: float = 1.0,
    y_noise: str = "fresh",
) -> Array:
    """CDiffE sampler: joint-state reverse SDE with re-diffused condition.

    ``noise_scale=0`` zeroes BOTH the per-step y re-diffusion noise and the
    integrator noise (deterministic testing hook, mirrors euler_maruyama).

    ``y_noise`` selects how the observed y is re-diffused to time T - t_i
    (the CDiffE-quality axis flagged in VERDICT r1 #4):
      * 'fresh'  — new noise every step (the reference's intent,
                   models/diffusion.py:172: y_t sampled inside the loop)
      * 'shared' — ONE noise draw reused along the trajectory (a single
                   forward Brownian path for y)
      * 'mean'   — noiseless mean path y_t = alpha(s) y

    Mirrors CDiffE.forward (models/diffusion.py:158-180): each step diffuses
    the OBSERVED y forward to time T - t_i, concatenates [x_t, y_t], and takes
    an unconditional joint reverse step, keeping only the x block.

    Fixes reference bug SURVEY.md §2.3.1: the reference calls the 3-arg
    ``mu(t, z_t)`` without its cond argument and crashes; the intended
    semantics (commented-out 2-arg mu, sdes.py:81-83) is the unconditional
    joint drift a(z_t, T-t) — realized here with cond=None.
    """
    if y_noise not in ("fresh", "shared", "mean"):
        raise ValueError(f"y_noise must be fresh|shared|mean, got {y_noise!r}")
    k0, kdiff, kscan = jax.random.split(key, 3)
    ydim = y.shape[-1]
    x0 = jax.random.normal(k0, (num_samples, xdim), dtype) * std + mean
    inflated_ys = jnp.broadcast_to(y.astype(dtype), (num_samples, ydim))
    z0 = jnp.concatenate([x0, inflated_ys], axis=1)
    delta = sde.T / num_steps
    ts = (jnp.arange(num_steps, dtype=dtype) / num_steps) * sde.T
    eps_shared = jax.random.normal(kdiff, z0.shape, dtype)

    def step(x, inp):
        t_i, kd, kn = inp
        # re-diffuse the observed y to time T - t_i (models/diffusion.py:172)
        s = sde.T - t_i
        if y_noise == "fresh":
            eps_y = noise_scale * jax.random.normal(kd, z0.shape, dtype)
        elif y_noise == "shared":
            eps_y = noise_scale * eps_shared
        else:
            eps_y = jnp.zeros_like(z0)
        y_t = (sde.base.mean_weight(s) * z0 + sde.base.std(s) * eps_y)[:, xdim:]
        z_t = jnp.concatenate([x, y_t], axis=1)
        t_col = jnp.full((num_samples, 1), t_i, dtype)
        mu = sde.mu(lambda xx, cc, ss: drift_a(xx, cc, ss), t_col, z_t, None, lmbd)
        sigma = sde.sigma(t_col, lmbd)
        noise = noise_scale * jax.random.normal(kn, z_t.shape, dtype)
        z_next = z_t + delta * mu + jnp.sqrt(delta) * sigma * noise
        return z_next[:, :xdim].astype(dtype), None

    kd = jax.random.split(kdiff, num_steps)
    kn = jax.random.split(kscan, num_steps)
    x_final, _ = jax.lax.scan(step, x0, (ts, kd, kn))
    return x_final


def heun_ode(
    sde: ReverseSDE,
    drift_a: Callable[[Array, Optional[Array], Array], Array],
    key: Array,
    y: Optional[Array],
    num_samples: int,
    xdim: int,
    num_steps: int = 50,
    mean: float = 0.0,
    std: float = 1.0,
    dtype=jnp.float32,
) -> Array:
    """Second-order (Heun) probability-flow ODE sampler.

    Capability the reference lacks (its only integrator is first-order
    Euler-Maruyama, models/diffusion.py:38-42): the deterministic
    probability-flow ODE shares the reverse SDE's marginals (Song et al.
    2021, eq. 13) and its drift is this codebase's ``mu`` at ``lmbd=1``
    (sigma(lmbd=1) = 0); Heun's trapezoidal corrector makes the integrator
    second-order, so far fewer score-net evaluations reach the same sample
    accuracy (the EDM sampler design, Karras et al. 2022).  Two drift
    evaluations per step -> num_steps=50 costs half of a 200-step E-M run.

    ``key`` only seeds the N(mean, std^2) initialization; the integration
    itself is deterministic.  Returns (num_samples, xdim).

    Caveat (measured on the linear problem): the deterministic flow has no
    noise to damp score error, so sample tails amplify it — with the EXACT
    score, 24 Heun steps transport near-exactly (moment error < 0.05,
    tests/test_samplers.py), but with a partially-trained MLP score the E-M
    sampler is more robust (cov error 0.03 vs 1-7 at 50-100 steps).  Use
    for well-trained scores / oracle analysis; E-M remains the default.
    """
    k0, _ = jax.random.split(key)
    x0 = jax.random.normal(k0, (num_samples, xdim), dtype) * std + mean
    cond = None
    if y is not None:
        cond = jnp.broadcast_to(y.astype(dtype), (num_samples, y.shape[-1]))
    delta = sde.T / num_steps
    ts = (jnp.arange(num_steps, dtype=dtype) / num_steps) * sde.T
    drift = lambda xx, cc, ss: drift_a(xx, cc, ss)

    def mu(t_scalar, x):
        t_col = jnp.full((num_samples, 1), t_scalar, dtype)
        return sde.mu(drift, t_col, x, cond, lmbd=1.0)

    # The corrector time on the LAST step would be exactly t=T (reverse-SDE
    # s=0) — outside the [t_epsilon, T] domain the score net trains on
    # (sde.sample_t clips at t_epsilon) and the singular point of some
    # analytic scores.  Clamp it one t_epsilon short (advisor round-2
    # finding); E-M never queries below s=T/num_steps either.
    t_corr_max = sde.T - sde.base.t_epsilon

    def step(x, t_i):
        d1 = mu(t_i, x)
        x_euler = x + delta * d1
        d2 = mu(jnp.minimum(t_i + delta, t_corr_max), x_euler)
        x_next = x + 0.5 * delta * (d1 + d2)
        return x_next.astype(dtype), None

    x_final, _ = jax.lax.scan(step, x0, ts)
    return x_final


def _exp_nodes(base, num_steps: int, s_min: float, grid: str, dtype):
    """Time nodes s_0 = T > s_1 > ... > s_num_steps = s_min for the
    exponential integrators, plus the closed-form (alpha, sigma) tables.

    grid='uniform' spaces the nodes linearly in s; grid='lambda' (default)
    spaces them uniformly in the half-log-SNR lambda(s) = log(alpha/sigma)
    — the DPM-Solver schedule, which concentrates steps where the marginal
    changes fastest.  Inversion is closed-form for the VP-SDE: from
    e^{2 lambda} = alpha^2/sigma^2 = e^{-B}/(1 - e^{-B}) follows
    B(s) = softplus(-2 lambda), and B inverts to s by the same quadratic as
    :meth:`VPSDE.sample_debiasing_t`.
    """
    if grid == "uniform":
        s = jnp.linspace(base.T, s_min, num_steps + 1, dtype=jnp.float64
                         if jax.config.jax_enable_x64 else jnp.float32)
    elif grid == "lambda":
        def lam(s_):
            a = base.mean_weight(jnp.asarray(s_))
            return jnp.log(a) - jnp.log(jnp.sqrt(1.0 - a**2))

        lams = jnp.linspace(lam(base.T), lam(s_min), num_steps + 1)
        b = jax.nn.softplus(-2.0 * lams)  # = B(s)
        bd = base.beta_max - base.beta_min
        s = (-base.beta_min + jnp.sqrt(base.beta_min**2 + 2.0 * bd * b)) / bd
        # endpoints exactly (the quadratic round-trips to ~1e-7)
        s = s.at[0].set(base.T).at[-1].set(s_min)
    else:
        raise ValueError(f"grid must be 'uniform' or 'lambda', got {grid!r}")
    alphas = base.mean_weight(s)
    sigmas = base.std(s)
    return s.astype(dtype), alphas.astype(dtype), sigmas.astype(dtype)


def exponential_integrator(
    sde: ReverseSDE,
    drift_a: Callable[[Array, Optional[Array], Array], Array],
    key: Array,
    y: Optional[Array],
    num_samples: int,
    xdim: int,
    num_steps: int = 40,
    mean: float = 0.0,
    std: float = 1.0,
    dtype=jnp.float32,
    noise_scale: float = 1.0,
    ode: bool = False,
    order: int = 1,
    grid: str = "lambda",
    s_min: Optional[float] = None,
    final_denoise: bool = True,
) -> Array:
    """Exponential integrators for the plug-in reverse process: the linear
    OU part of the VP reverse SDE/ODE is integrated EXACTLY in closed form
    and only the learned noise prediction is held (or linearly extrapolated)
    across each step — so far fewer score-net evaluations reach 200-step
    Euler-Maruyama accuracy.  Capability the reference lacks (its only
    integrator is first-order E-M, reference models/diffusion.py:27-46).

    With eps_hat(x, s) = -sigma(s) * a(x, y, s) / g(s) (the noise the DSM
    loss trains ``a`` to predict, see :func:`dmip_tpu.sde.reverse_sde_dsm`),
    each step s_i -> s_{i+1} (s decreasing, Phi = alpha_{i+1}/alpha_i,
    h = lambda_{i+1} - lambda_i > 0) is

      ode=True  (DDIM / DPM-Solver-1):
        x <- Phi x + (sigma_{i+1} - Phi sigma_i) eps_hat
      ode=False (SDE exponential Euler / SDE-DPM-Solver-1, default):
        x <- Phi x + 2 (sigma_{i+1} - Phi sigma_i) eps_hat
               + sqrt(Phi^2 - 1) z,  z ~ N(0, I)

    both derived by variation-of-constants on this codebase's reverse drift
    ``mu = g a + 0.5 beta x`` (sde.py ReverseSDE.mu at lmbd 0/1); the noise
    variance Phi^2 - 1 equals the textbook sigma_{i+1}^2 (e^{2h} - 1).  The
    SDE form keeps E-M's error-damping noise, which BENCHMARKS.md measured
    to matter for partially-trained scores (heun_ode caveat).

    order=2 replaces eps_hat with its two-point linear extrapolation to the
    step midpoint in lambda (the DPM-Solver++(2M) multistep correction):
    eps_hat_i + (eps_hat_i - eps_hat_{i-1}) * h_i / (2 h_{i-1}); the first
    step falls back to order 1.

    ``final_denoise=True`` appends one exact denoise-to-mean step
    x <- (x - sigma eps_hat)/alpha at s_min (one extra net evaluation, so
    NFE = num_steps + 1): the deterministic limit of the last ancestral
    step, removing the residual sigma(s_min) blur.  ``s_min`` defaults to
    the net's training floor ``base.t_epsilon``.

    ``noise_scale=0`` zeroes the SDE noise (testing hook, mirrors
    euler_maruyama); ``key`` seeds init + noise.  Returns (num_samples, xdim).

    Measured (exact-score linear oracle, 40k samples, moment error; see
    tests/test_samplers.py): EM-200 = 0.007, EM-16 = 0.071; expint-16
    sde/o2 = 0.020, expint-32 sde/o1 = 0.009 — i.e. ~6x fewer net
    evaluations than 200-step E-M at equal accuracy.  Caveat: the SDE form's
    step coefficient 2(e^h - 1) grows exponentially in the lambda step h, so
    at very coarse grids it amplifies the extrapolation error — at 8 steps
    sde/o2 diverges (err 3e3) while ode/o2 is fine (0.055).  Use >= 16 steps
    for the SDE form, or the ODE form when pushing NFE to the floor.

    With a PARTIALLY-TRAINED score (300-epoch CDE, measured on TPU) the
    ranking flips to favor the robust defaults: expint-32 sde/o1 = 0.042 vs
    EM-200 = 0.031 (6x fewer NFE, near-equal accuracy), while 16-step o2
    variants amplify score error (sde/o2 0.19, ode/o2 3.3) — the same
    noise-damps-score-error effect as the heun_ode caveat above.
    """
    if order not in (1, 2):
        raise ValueError(f"order must be 1 or 2, got {order!r}")
    base = sde.base
    if s_min is None:
        s_min = base.t_epsilon
    k0, kscan = jax.random.split(key)
    x0 = jax.random.normal(k0, (num_samples, xdim), dtype) * std + mean
    cond = None
    if y is not None:
        cond = jnp.broadcast_to(y.astype(dtype), (num_samples, y.shape[-1]))

    s_nodes, alphas, sigmas = _exp_nodes(base, num_steps, s_min, grid, dtype)
    lam = jnp.log(alphas) - jnp.log(sigmas)
    h = lam[1:] - lam[:-1]  # (num_steps,) > 0
    phi = alphas[1:] / alphas[:-1]
    c_ode = sigmas[1:] - phi * sigmas[:-1]
    c_eps = c_ode if ode else 2.0 * c_ode
    c_n = (jnp.zeros_like(phi) if ode
           else jnp.sqrt(jnp.maximum(phi**2 - 1.0, 0.0)))
    s_eval, sig_eval, g_eval = s_nodes[:-1], sigmas[:-1], base.g(s_nodes[:-1])

    if final_denoise:
        # exact denoise-to-mean: x_0 = (x - sigma eps_hat)/alpha at s_min
        phi_f = 1.0 / alphas[-1]
        s_eval = jnp.concatenate([s_eval, s_nodes[-1:]])
        sig_eval = jnp.concatenate([sig_eval, sigmas[-1:]])
        g_eval = jnp.concatenate([g_eval, base.g(s_nodes[-1:])])
        phi = jnp.concatenate([phi, phi_f[None]])
        c_eps = jnp.concatenate([c_eps, (-phi_f * sigmas[-1])[None]])
        c_n = jnp.concatenate([c_n, jnp.zeros((1,), c_n.dtype)])
        h = jnp.concatenate([h, h[-1:]])  # placeholder; c2 zeroed below

    n_steps_real = num_steps  # integration steps, excluding the denoise
    n_total = phi.shape[0]
    h_prev = jnp.concatenate([jnp.ones((1,), h.dtype), h[:-1]])
    # order-2 midpoint-extrapolation weight; 0 on the first step AND on the
    # final denoise (the exact denoise-to-mean uses eps_hat(s_min) itself —
    # the multistep correction targets a step midpoint that does not exist
    # for the jump to the mean)
    c2 = (jnp.where((jnp.arange(n_total) == 0)
                    | (jnp.arange(n_total) >= n_steps_real),
                    0.0, h / (2.0 * h_prev))
          if order == 2 else jnp.zeros((n_total,), h.dtype))
    keys = jax.random.split(kscan, n_total)

    def step(carry, inp):
        x, eps_prev = carry
        s_i, sig_i, g_i, phi_i, ce_i, cn_i, c2_i, k = inp
        s_col = jnp.full((num_samples, 1), s_i, dtype)
        eps_hat = -sig_i * drift_a(x, cond, s_col) / g_i
        eps_use = eps_hat + c2_i * (eps_hat - eps_prev)
        z = noise_scale * jax.random.normal(k, x.shape, dtype)
        x_next = phi_i * x + ce_i * eps_use + cn_i * z
        return (x_next.astype(dtype), eps_hat), None

    (x_final, _), _ = jax.lax.scan(
        step, (x0, jnp.zeros_like(x0)),
        (s_eval, sig_eval, g_eval, phi, c_eps, c_n,
         c2.astype(dtype), keys),
    )
    return x_final


def batched_sampler(sampler_fn):
    """vmap a single-condition sampler over a batch of ys and keys.

    Usage: batched_sampler(partial(euler_maruyama, sde, drift_a,
    num_samples=..., ...))(keys, ys) -> (n_y, num_samples, xdim).
    Shard ``ys``/``keys`` over the mesh 'data' axis to fan evaluation out
    across chips (SURVEY.md §5 'distributed communication backend').
    """

    def run(keys: Array, ys: Array) -> Array:
        return jax.vmap(sampler_fn)(keys, ys)

    return run
