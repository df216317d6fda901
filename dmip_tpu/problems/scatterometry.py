"""Scatterometry inverse problem: frozen neural surrogate forward model.

Re-specifies reference ``utils_scatterometry.py``: a pretrained MLP
3 -> 256 -> 256 -> 256 -> 23 (ReLU) forward operator with heteroscedastic
noise y = f(x) + b xi1 + a f(x) xi2 (a=0.2, b=0.01), a smoothed-uniform prior
on [-1, 1]^3 realized by a boundary loss of strength lambd_bd=1000, and the
resulting (negative) log posterior energy.

The surrogate weights ship as a plain .npz (converted once from the
reference's surrogate.pt by tools/convert_surrogate.py); the apply function
is a pure JAX MLP so the forward model folds into jitted training steps and
MCMC kernels (the reference calls it 2x per Metropolis step,
models/SNF.py:258-261).
"""

from __future__ import annotations

import os
from typing import Callable, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array

_DEFAULT_WEIGHTS = os.path.join(
    os.path.dirname(__file__), "data", "scatterometry_surrogate.npz"
)

DEFAULT_PARAMS: Dict[str, float] = {
    # reference utils_scatterometry.py:17-23
    "a": 0.2,
    "b": 0.01,
    "lambd_bd": 1000.0,
    "xdim": 3,
    "ydim": 23,
}


def load_surrogate_weights(
    weights_path: str = _DEFAULT_WEIGHTS, dtype=jnp.float32
):
    """The frozen surrogate's raw (W, b) pairs (for the fused MH kernel)."""
    data = np.load(weights_path)
    n_layers = len([k for k in data.files if k.startswith("w")])
    return tuple(
        (jnp.asarray(data[f"w{i}"], dtype), jnp.asarray(data[f"b{i}"], dtype))
        for i in range(n_layers)
    )


def load_forward_model(
    weights_path: str = _DEFAULT_WEIGHTS, dtype=jnp.float32
) -> Tuple[Callable[[Array], Array], Dict[str, float]]:
    """Load the frozen surrogate; returns (apply_fn, params).

    apply_fn maps (..., 3) -> (..., 23) and is pure (weights closed over as
    constants, so XLA constant-folds them into the compiled kernel).
    Mirrors reference utils_scatterometry.py:8-25.
    """
    weights = load_surrogate_weights(weights_path, dtype)

    def apply_fn(x: Array) -> Array:
        h = x
        for w, b in weights[:-1]:
            h = jax.nn.relu(h @ w + b)
        w, b = weights[-1]
        return h @ w + b

    return apply_fn, dict(DEFAULT_PARAMS)


def get_log_posterior(
    samples: Array,
    forward_model: Callable[[Array], Array],
    a: float,
    b: float,
    ys: Array,
    lambd_bd: float,
) -> Array:
    """NEGATIVE log posterior energy (reference utils_scatterometry.py:27-38).

    0.5 sum log((a f)^2 + b^2) + 0.5 sum (y - f)^2 / ((a f)^2 + b^2)
    + lambd_bd * sum relu(x-1) + relu(-1-x)
    """
    f = forward_model(samples)
    prefactor = (a * f) ** 2 + b**2
    p = 0.5 * jnp.sum(jnp.log(prefactor), axis=-1)
    p2 = 0.5 * jnp.sum((ys - f) ** 2 / prefactor, axis=-1)
    p3 = lambd_bd * jnp.sum(
        jax.nn.relu(samples - 1.0) + jax.nn.relu(-1.0 - samples), axis=-1
    )
    return p + p2 + p3


def inverse_cdf_prior(u: Array, lambd_bd: float) -> Array:
    """Exact inverse-CDF sampler of the smoothed-uniform (boundary-loss) prior.

    Piecewise log/linear inverse CDF (reference utils_scatterometry.py:43-52),
    written branchless for jit: u ~ U(0,1) -> x in (-inf, inf), concentrated
    on [-1, 1] with exp(-lambd_bd |x|-ish) tails.
    """
    v = u * (2.0 * lambd_bd + 2.0) / lambd_bd
    left = jnp.log(jnp.maximum(v * lambd_bd, 1e-38)) - 1.0
    middle = v - 1.0 / lambd_bd - 1.0
    right = -jnp.log(jnp.maximum(((2.0 + 2.0 / lambd_bd) - v) * lambd_bd, 1e-38)) + 1.0
    out = jnp.where(v < 1.0 / lambd_bd, left, middle)
    return jnp.where(v >= 2.0 + 1.0 / lambd_bd, right, out)


def sample_prior(key: Array, n: int, lambd_bd: float, xdim: int = 3) -> Array:
    """Draw n samples from the smoothed-uniform prior via the inverse CDF.

    u is clipped away from {0, 1}: f32 uniforms hit 0 with prob ~2^-24 and
    the log-tail maps u=0 to x ~ -88, which produced inf losses deep into
    training runs.  The clip truncates tails beyond |x| ~ 1 + 16/lambd_bd
    (mass < 1e-7) — negligible versus the reference's numpy sampler.
    """
    u = jax.random.uniform(key, (n, xdim), minval=1e-7, maxval=1.0 - 1e-7)
    return inverse_cdf_prior(u, lambd_bd)


def noisy_forward(
    key: Array, forward_model: Callable[[Array], Array], x: Array, a: float, b: float
) -> Array:
    """Heteroscedastic noise model y = f(x) + b xi1 + a f(x) xi2.

    Reference datasets.py:15,29-30.
    """
    y = forward_model(x)
    k1, k2 = jax.random.split(key)
    return (
        y
        + b * jax.random.normal(k1, y.shape, y.dtype)
        + a * y * jax.random.normal(k2, y.shape, y.dtype)
    )


def score_posterior(
    forward_model: Callable[[Array], Array],
    a: float,
    b: float,
    lambd_bd: float,
) -> Callable[[Array, Array], Array]:
    """-grad_x of the energy: the posterior score used as PINN IC / eval truth.

    Mirrors main_diffusion_scatterometry.py:142-145 (autograd through the
    surrogate) with a single reverse-mode gradient.
    """

    def score(x: Array, ys: Array) -> Array:
        e = lambda z: jnp.sum(
            get_log_posterior(z, forward_model, a, b, ys, lambd_bd)
        )
        return -jax.grad(e)(x)

    return score
