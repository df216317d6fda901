"""Score networks as pure init/apply pytrees (TPU-native).

Re-specifies reference ``nets.py``:
  * :func:`mlp_init` / :func:`score_mlp_apply`  — conditional score net
    ``MLP(x, y, t)`` (reference nets.py:17-35): concat [x, y, t] input,
    tanh hidden activations, linear output.
  * :func:`prior_mlp_apply` — unconditional variant ``MLP2(x, t)``
    (reference nets.py:37-57).
  * :func:`posterior_score_apply` — ``PosteriorScore`` (reference
    nets.py:143-157): g(t) * (prior_net(x,t) + likelihood_net(x,y,t)).
  * :func:`fourier_init` / :func:`fourier_apply` — GaussianFourierProjection
    time embedding (reference nets.py:6-15) and the TemporalMLP variants
    (reference nets.py:60-141; kept for API parity — the reference marks
    them unused).

Design: parameters are tuples of (W, b); matmuls hit the MXU with batch as
the leading dimension.  Weight init mirrors torch.nn.Linear's default
(U(-1/sqrt(fan_in), 1/sqrt(fan_in)) for both W and b) so training dynamics
are comparable to the reference.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

Array = jax.Array
MLPParams = Tuple[Tuple[Array, Array], ...]


def _linear_init(key: Array, fan_in: int, fan_out: int, dtype=jnp.float32):
    kw, kb = jax.random.split(key)
    bound = 1.0 / jnp.sqrt(fan_in)
    w = jax.random.uniform(kw, (fan_in, fan_out), dtype, -bound, bound)
    b = jax.random.uniform(kb, (fan_out,), dtype, -bound, bound)
    return w, b


def mlp_init(
    key: Array,
    input_dim: int,
    output_dim: int,
    hidden_layers: Sequence[int] = (512, 512, 512),
    dtype=jnp.float32,
) -> MLPParams:
    """Initialize a feed-forward net: input -> hidden_layers -> output."""
    dims = [input_dim, *hidden_layers, output_dim]
    keys = jax.random.split(key, len(dims) - 1)
    return tuple(
        _linear_init(k, dims[i], dims[i + 1], dtype) for i, k in enumerate(keys)
    )


def mlp_apply(params: MLPParams, h: Array, activation=jnp.tanh) -> Array:
    """Plain forward pass on a pre-concatenated input (batch, features)."""
    for w, b in params[:-1]:
        h = activation(h @ w + b)
    w, b = params[-1]
    return h @ w + b


def _as_t_column(t: Array, batch: int) -> Array:
    """Broadcast t to shape (batch, 1) (reference uses t.view(len(x), 1))."""
    t = jnp.asarray(t)
    if t.ndim == 0:
        return jnp.full((batch, 1), t)
    return t.reshape(batch, 1)


def score_mlp_apply(
    params: MLPParams, x: Array, y: Optional[Array], t: Array, activation=jnp.tanh
) -> Array:
    """Conditional score net a(x, y, t): concat [x, y, t] (reference nets.py:32-35).

    ``y=None`` (or an empty array) encodes the CDiffE convention where the
    condition is already part of the diffused state (the reference's fragile
    ``torch.Tensor([])`` sentinel, losses.py:149 — fixed here as an explicit
    Optional).
    """
    batch = x.shape[0]
    parts = [x]
    if y is not None and y.size > 0:
        parts.append(y)
    parts.append(_as_t_column(t, batch))
    return mlp_apply(params, jnp.concatenate(parts, axis=-1), activation)


def prior_mlp_apply(
    params: MLPParams, x: Array, t: Array, activation=jnp.tanh
) -> Array:
    """Unconditional score net a(x, t) — reference MLP2 (nets.py:52-57)."""
    batch = x.shape[0]
    h = jnp.concatenate([x, _as_t_column(t, batch)], axis=-1)
    return mlp_apply(params, h, activation)


def posterior_score_apply(
    prior_params: MLPParams,
    likelihood_params: MLPParams,
    g_fn,
    x: Array,
    y: Array,
    t: Array,
) -> Array:
    """PosteriorScore: g(t) * (prior(x,t) + likelihood(x,y,t)).

    Reference nets.py:155-157.  ``g_fn`` is the forward SDE's diffusion
    coefficient (a closed form on :class:`dmip_tpu.sde.VPSDE`).
    """
    s = prior_mlp_apply(prior_params, x, t) + score_mlp_apply(
        likelihood_params, x, y, t
    )
    batch = x.shape[0]
    return g_fn(_as_t_column(t, batch)) * s


# -- Gaussian Fourier time embedding + TemporalMLP (API parity; reference
#    nets.py:6-15, 60-141 — explicitly unused by the reference mains) --------


def fourier_init(key: Array, embed_dim: int, scale: float = 30.0) -> Array:
    """Fixed (non-trainable) random frequencies W of shape (embed_dim // 2,)."""
    return jax.random.normal(key, (embed_dim // 2,)) * scale


def fourier_apply(w: Array, t: Array) -> Array:
    """[sin(2 pi t W), cos(2 pi t W)] — reference nets.py:13-15."""
    t = t.reshape(-1)
    proj = t[:, None] * w[None, :] * (2.0 * jnp.pi)
    return jnp.concatenate([jnp.sin(proj), jnp.cos(proj)], axis=-1)


def temporal_mlp_init(
    key: Array,
    input_dim: int,
    output_dim: int,
    embed_dim: int,
    hidden_layers: Sequence[int],
    scale: float = 30.0,
):
    """TemporalMLP params: (fourier W, mlp params) — reference nets.py:60-104."""
    kf, km = jax.random.split(key)
    w = fourier_init(kf, embed_dim, scale)
    mlp = mlp_init(km, input_dim + embed_dim, output_dim, hidden_layers)
    return (w, mlp)


def temporal_mlp_apply(params, x: Array, t: Array, y: Array, activation=jnp.tanh):
    """TemporalMLP(x, t, y): concat [x, fourier(t), y] (reference nets.py:87-104)."""
    w, mlp = params
    h = jnp.concatenate([x, fourier_apply(w, t), y], axis=-1)
    return mlp_apply(mlp, h, activation)
