"""Training infrastructure: jitted train steps, scanned epochs, model factory.

Replaces the reference's per-model ``train_epoch`` Python loops
(models/diffusion.py:74-105, 123-156, 204-229) and driver-level ``train``
functions (main_diffusion_linear.py:19-51, main_diffusion_scatterometry.py:19-37)
with:

  * ``make_train_step``   — value_and_grad + optax update, one pure function
  * ``make_epoch_fn``     — an entire epoch (batching + all steps) under one
                            ``jit``'d ``lax.scan``; data generation (fresh
                            noise / fresh simulation) happens on device
  * ``fit``               — the Python-level epoch driver with metric logging
  * ``get_model_from_args`` — config-string -> (model, loss config) factory
                            (reference utils.py:22-48)

Multi-chip: ``fit`` accepts an optional ``jax.sharding.Sharding`` for the
batch; with a mesh the epoch data is laid out batch-sharded and XLA inserts
the gradient psum automatically (data parallelism; see dmip_tpu.parallel).
"""

from __future__ import annotations

import dataclasses
import time
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from . import data as data_mod
from .models.diffusion import (
    CDE,
    CDiffE,
    DiffusionModel,
    LossConfig,
    PosteriorDiffusionEstimator,
)

Array = jax.Array


@dataclasses.dataclass
class TrainState:
    params: Any
    opt_state: Any
    step: int = 0


def make_train_step(loss_fn, optimizer):
    """One SGD step: (params, opt_state, key, x, y) -> (params, opt_state, loss, info)."""

    def step(params, opt_state, key, x, y):
        (loss, info), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, key, x, y
        )
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss, info

    return step


def make_epoch_fn(
    loss_fn,
    optimizer,
    batch_fn: Callable[..., Tuple[Array, Array]],
    donate: bool = True,
):
    """Build a jitted epoch: generate this epoch's batches on device, then
    ``lax.scan`` the train step over them.

    ``batch_fn(key, ...) -> (xb, yb)`` with shapes (n_batches, batch, dim);
    extra batch_fn args are closed over by the caller.
    """
    train_step = make_train_step(loss_fn, optimizer)

    def epoch(params, opt_state, key):
        kdata, kscan = jax.random.split(key)
        xb, yb = batch_fn(kdata)
        n_batches = xb.shape[0]
        keys = jax.random.split(kscan, n_batches)

        def body(carry, inp):
            params, opt_state = carry
            k, x, y = inp
            params, opt_state, loss, info = train_step(params, opt_state, k, x, y)
            return (params, opt_state), (loss, info)

        (params, opt_state), (losses, infos) = jax.lax.scan(
            body, (params, opt_state), (keys, xb, yb)
        )
        mean_info = {k: jnp.mean(v) for k, v in infos.items()}
        return params, opt_state, jnp.mean(losses), mean_info

    return jax.jit(epoch, donate_argnums=(0, 1) if donate else ())


def fit(
    epoch_fn,
    params,
    optimizer,
    key: Array,
    num_epochs: int,
    log_every: int = 50,
    logger=None,
    desc: str = "train",
) -> Tuple[Any, Dict[str, float]]:
    """Python-level epoch driver (reference main_*.py train loops).

    ``logger``: optional :class:`dmip_tpu.utils.metrics.MetricsWriter`.
    Returns (params, last_info).
    """
    opt_state = optimizer.init(params)
    last_info: Dict[str, float] = {}
    t0 = time.time()
    for i in range(num_epochs):
        key, ek = jax.random.split(key)
        params, opt_state, loss, info = epoch_fn(params, opt_state, ek)
        if logger is not None:
            logger.scalar("Train/Loss", float(loss), i)
            for k, v in info.items():
                logger.scalar("Train/" + k, float(v), i)
        if log_every and (i % log_every == 0 or i == num_epochs - 1):
            jax.block_until_ready(loss)
            rate = (i + 1) / (time.time() - t0)
            print(
                f"[{desc}] epoch {i + 1}/{num_epochs} loss={float(loss):.4f} "
                f"({rate:.1f} epochs/s)",
                flush=True,
            )
        last_info = {k: float(v) for k, v in info.items()}
    return params, last_info


# ---------------------------------------------------------------------------
# Model / loss factory (reference utils.py:22-48)
# ---------------------------------------------------------------------------

_MODELS = {
    "CDE": CDE,
    "CDiffE": CDiffE,
    "Posterior": PosteriorDiffusionEstimator,
}


def get_model_from_args(
    config: Dict[str, Any], forward_model_params: Dict[str, Any]
) -> Tuple[DiffusionModel, LossConfig]:
    """Map config strings to (model, loss config).

    Mirrors utils.get_model_from_args (utils.py:22-48), including the rule
    that the Posterior model defaults to the PosteriorLoss.  Fixes reference
    bug SURVEY.md §2.3.2 (5-arg call vs 4-arg signature) by construction.
    """
    name = config["model"]
    if name not in _MODELS:
        raise ValueError(
            'No valid value for "model" passed. Has to be one of '
            '"CDE", "CDiffE" or "Posterior".'
        )
    model = _MODELS[name](
        xdim=int(forward_model_params["xdim"]),
        ydim=int(forward_model_params["ydim"]),
        hidden_layers=tuple(config.get("hidden_layers", (512, 512, 512))),
    )

    loss_name = config.get("loss_fn")
    if name == "Posterior" and loss_name not in (
        "PINNLoss",
        "PINNLoss2",
        "DSM_PDE",
        "DSM",
    ):
        loss_name = "PosteriorLoss"
    if loss_name is None:
        raise ValueError(
            'No valid loss_fn was specified. Options are: "PINNLoss", '
            '"PINNLoss2", "DSM" or "DSM_PDE". When the model is '
            "PosteriorDiffusionEstimator, the PosteriorLoss is used as default."
        )
    cfg = LossConfig(
        name=loss_name,
        lam=float(config.get("lam", 1.0)),
        lam2=float(config.get("lam2", 1.0)),
        pde_loss=config.get("pde_loss", "FPE"),
        pde_metric=config.get("pde_metric", "L1"),
        ic_metric=config.get("ic_metric", "L1"),
        divergence_method=config.get("divergence_method", "exact"),
    )
    return model, cfg
