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

Multi-chip: ``make_epoch_fn(..., mesh=...)`` (an explicit Mesh or "auto")
shards each on-device batch over the mesh's 'data' axis with parameters
replicated; XLA inserts the gradient all-reduce automatically (data
parallelism; see dmip_tpu.parallel).  ``fit`` is placement-agnostic — the
jitted epoch fn carries the shardings.
"""

from __future__ import annotations

import dataclasses
import time
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

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


def make_train_step(loss_fn, optimizer, skip_nonfinite: bool = True):
    """One SGD step: (params, opt_state, key, x, y) -> (params, opt_state, loss, info).

    ``skip_nonfinite`` (default on) drops an update whose gradients contain
    inf/nan instead of poisoning the parameters — single-batch numeric
    spikes (e.g. extreme prior-tail samples through the boundary-loss
    energy) otherwise NaN the whole run irrecoverably, as they would in the
    reference.  Healthy-step dynamics are bit-identical.
    """

    def step(params, opt_state, key, x, y):
        (loss, info), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, key, x, y
        )
        updates, new_opt_state = optimizer.update(grads, opt_state, params)
        new_params = optax.apply_updates(params, updates)
        if skip_nonfinite:
            finite = jnp.all(
                jnp.stack(
                    [jnp.all(jnp.isfinite(g)) for g in jax.tree_util.tree_leaves(grads)]
                )
            )
            keep = lambda new, old: jax.tree_util.tree_map(
                lambda a, b: jnp.where(finite, a, b), new, old
            )
            new_params = keep(new_params, params)
            new_opt_state = keep(new_opt_state, opt_state)
        return new_params, new_opt_state, loss, info

    return step


def build_optimizer(
    lr: float,
    grad_clip: Optional[float] = None,
    schedule: Optional[str] = None,
    decay_steps: Optional[int] = None,
    lr_min_ratio: float = 0.01,
):
    """Adam with optional global-norm gradient clipping (config 'grad_clip')
    and optional learning-rate decay (config 'lr_schedule').

    ``schedule='cosine'`` decays ``lr`` -> ``lr * lr_min_ratio`` over
    ``decay_steps`` optimizer steps (the driver passes
    n_epochs x batches-per-epoch).  This is the long-schedule recipe that
    converges the scatterometry CDE to KL 0.624 (BENCHMARKS.md "Closing the
    diffusion-vs-SNF gap"), now reachable from the config files.
    """
    if schedule in (None, "", "constant"):
        tx = optax.adam(lr)
    elif schedule == "cosine":
        if not decay_steps:
            raise ValueError("lr_schedule='cosine' requires decay_steps")
        tx = optax.adam(
            optax.cosine_decay_schedule(
                float(lr), int(decay_steps), alpha=float(lr_min_ratio)
            )
        )
    else:
        raise ValueError(
            f"unknown lr schedule {schedule!r}; options: 'constant', 'cosine'"
        )
    if grad_clip:
        return optax.chain(optax.clip_by_global_norm(float(grad_clip)), tx)
    return tx


def resolve_mesh(mesh):
    """'auto' -> a 1-D data mesh over all visible devices when >1, an
    explicit Mesh, or None (single-device)."""
    if mesh == "auto":
        if len(jax.devices()) > 1:
            from .parallel.mesh import get_mesh

            return get_mesh()
        return None
    if mesh is not None and getattr(mesh, "size", 1) <= 1:
        return None
    return mesh


def make_epoch_fn(
    loss_fn,
    optimizer,
    batch_fn: Callable[..., Tuple[Array, Array]],
    epochs_per_call: int = 1,
    donate: bool = True,
    mesh=None,
    axis_name: str = "data",
):
    """Build a jitted multi-epoch step: each epoch generates its batches on
    device (fresh noise / fresh simulation) and ``lax.scan``s the train step
    over them; ``epochs_per_call`` epochs are folded into ONE dispatch via an
    outer scan — on the TPU tunnel, per-dispatch latency (~0.5-1s) otherwise
    dominates these small-matmul workloads.

    ``batch_fn(key) -> (xb, yb)`` with shapes (n_batches, batch, dim).
    Returns epoch(params, opt_state, key) -> (params, opt_state,
    per-epoch losses (epochs_per_call,), per-epoch info dict).

    ``mesh``: None (single-device), an explicit ``jax.sharding.Mesh``, or
    "auto" (all visible devices when >1).  With a mesh, each generated batch
    is sharded over ``axis_name`` and parameters replicated — XLA inserts the
    gradient all-reduce (data parallelism); the key schedule and update
    dynamics are bit-compatible with the single-device path (verified by
    tests/test_sharding.py).
    """
    train_step = make_train_step(loss_fn, optimizer)
    use_mesh = resolve_mesh(mesh)
    if use_mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        batch_sh = NamedSharding(use_mesh, P(None, axis_name))
        repl = NamedSharding(use_mesh, P())

    def one_epoch(carry, ekey):
        params, opt_state = carry
        kdata, kscan = jax.random.split(ekey)
        xb, yb = batch_fn(kdata)
        if use_mesh is not None:
            # (n_batches, batch, dim): shard the within-batch axis so each
            # device owns batch/n_devices examples of every step.
            xb = jax.lax.with_sharding_constraint(xb, batch_sh)
            yb = jax.lax.with_sharding_constraint(yb, batch_sh)
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
        return (params, opt_state), (jnp.mean(losses), mean_info)

    def masked_epoch(carry, inp):
        # Epochs at j >= n_active are computed but their updates discarded:
        # the final chunk of a non-divisible num_epochs stops EXACTLY at
        # num_epochs without recompiling for the remainder length.
        j, ekey, n_active = inp
        new_carry, out = one_epoch(carry, ekey)
        active = j < n_active
        keep = jax.tree_util.tree_map(
            lambda a, b: jnp.where(active, a, b), new_carry, carry
        )
        return keep, out

    def epochs(params, opt_state, key, epoch0, n_active=epochs_per_call):
        # fold_in(master, global_epoch_index): the key schedule is invariant
        # to epochs_per_call chunking, so resume and re-chunking are exact.
        js = jnp.arange(epochs_per_call)
        keys = jax.vmap(lambda j: jax.random.fold_in(key, epoch0 + j))(js)
        (params, opt_state), (losses, infos) = jax.lax.scan(
            masked_epoch,
            (params, opt_state),
            (js, keys, jnp.broadcast_to(n_active, js.shape)),
        )
        return params, opt_state, losses, infos

    if use_mesh is not None:
        # Params/opt_state replicated; jit moves them onto the mesh on the
        # first call, so ``fit`` needs no special placement.
        fn = jax.jit(
            epochs,
            in_shardings=(repl, repl, repl, repl, repl),
            out_shardings=(repl, repl, repl, repl),
            donate_argnums=(0, 1) if donate else (),
        )
    else:
        fn = jax.jit(epochs, donate_argnums=(0, 1) if donate else ())
    return fn


def select_epoch_fn(
    config: Dict[str, Any],
    model,
    loss_fn,
    optimizer,
    batch_fn: Callable[..., Tuple[Array, Array]],
    epochs_per_call: int,
):
    """Build the epoch engine the config asks for.

    ``train_backend: xla`` (default) — :func:`make_epoch_fn`, the jitted
    whole-epoch scan, with optional data-parallel ``mesh``.
    ``train_backend: fused_pallas`` — the whole-epochs-on-chip Pallas DSM
    kernel (ops/dsm_train_kernel.py; measured at XLA-path parity, see its
    docstring).  Only valid for the DSM fast path: loss_fn 'DSM', plain
    adam at a constant lr (no grad_clip / cosine schedule), CDE or CDiffE
    model, single device.  Invalid combinations raise with the reason
    rather than silently falling back.

    ``train_guard`` (fused backend only): 'grads' (default — the XLA
    path's exact skip-nonfinite semantics, measured at 4.7 us/step),
    'loss' (one scalar check on the batch loss, ~zero cost, catches the
    realistic non-finite-data/divergence failures), or 'off'.
    """
    backend = config.get("train_backend", "xla")
    if backend == "xla":
        return make_epoch_fn(
            loss_fn,
            optimizer,
            batch_fn,
            epochs_per_call=epochs_per_call,
            mesh=config.get("mesh", "auto"),
        )
    if backend == "fused_pallas":
        problems = []
        if config.get("loss_fn") != "DSM":
            problems.append(f"loss_fn must be 'DSM', got {config.get('loss_fn')!r}")
        if config.get("model") not in ("CDE", "CDiffE"):
            problems.append(f"model must be CDE/CDiffE, got {config.get('model')!r}")
        if config.get("grad_clip"):
            problems.append("grad_clip is not supported")
        if config.get("lr_schedule", "constant") not in (None, "constant"):
            problems.append("lr_schedule must be constant")
        if resolve_mesh(config.get("mesh", "auto")) is not None:
            problems.append(
                "multi-device mesh is not supported (use train_backend: xla "
                "for data parallelism)"
            )
        guard = config.get("train_guard", "grads")
        if guard not in ("grads", "loss", "off"):
            problems.append(
                f"train_guard must be 'grads'/'loss'/'off', got {guard!r}"
            )
        if problems:
            raise ValueError(
                "train_backend: fused_pallas — " + "; ".join(problems)
            )
        from .ops.dsm_train_kernel import make_fused_dsm_epoch_fn

        return make_fused_dsm_epoch_fn(
            model, float(config.get("lr", 1e-4)), batch_fn,
            epochs_per_call=epochs_per_call,
            skip_nonfinite={"grads": True, "loss": "loss", "off": False}[guard],
        )
    raise ValueError(
        f"unknown train_backend {backend!r}; options: 'xla', 'fused_pallas'"
    )


def fit(
    epoch_fn,
    params,
    optimizer,
    key: Array,
    num_epochs: int,
    epochs_per_call: int = 1,
    log_every: int = 50,
    logger=None,
    desc: str = "train",
    opt_state=None,
    start_epoch: int = 0,
) -> Tuple[Any, Dict[str, float]]:
    """Python-level epoch driver (reference main_*.py train loops).

    ``epoch_fn`` must come from :func:`make_epoch_fn` with the same
    ``epochs_per_call``.  ``logger``: optional
    :class:`dmip_tpu.utils.metrics.MetricsWriter`.  Returns (params,
    opt_state, last_info) — checkpoint opt_state alongside params for exact
    resume.

    Parameters advance EXACTLY (num_epochs - start_epoch) epochs: the final
    chunk of a non-divisible combination masks the surplus epochs' updates
    inside the jitted scan (no recompile, same key schedule).
    """
    if opt_state is None:
        opt_state = optimizer.init(params)
    last_info: Dict[str, float] = {}
    t0 = time.time()
    n_calls = -(-max(num_epochs - start_epoch, 0) // epochs_per_call)
    epoch = start_epoch
    for c in range(n_calls):
        n_active = min(epochs_per_call, num_epochs - epoch)
        params, opt_state, losses, infos = epoch_fn(
            params, opt_state, key, jnp.asarray(epoch, jnp.int32),
            jnp.asarray(n_active, jnp.int32),
        )
        losses = jax.device_get(losses)
        infos = jax.device_get(infos)
        for j in range(len(losses)):
            if epoch >= num_epochs:
                break
            if logger is not None:
                logger.scalar("Train/Loss", float(losses[j]), epoch)
                for k, v in infos.items():
                    logger.scalar("Train/" + k, float(v[j]), epoch)
            epoch += 1
        if log_every and (c % max(log_every // epochs_per_call, 1) == 0
                          or c == n_calls - 1):
            rate = (epoch - start_epoch) / (time.time() - t0)
            print(
                f"[{desc}] epoch {epoch}/{num_epochs} "
                f"loss={float(losses[-1]):.4f} ({rate:.1f} epochs/s)",
                flush=True,
            )
        last_info = {k: float(v[-1]) for k, v in infos.items()}
    return params, opt_state, last_info


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
    if name == "Posterior":
        # The Posterior model trains only with the PosteriorLoss.  The
        # reference factory (utils.py:34-47) lets other loss names through
        # and then crashes in train_epoch on the mismatched signature; here
        # a conflicting request is rejected up front.
        if loss_name in (None, "PosteriorLoss"):
            loss_name = "PosteriorLoss"
        else:
            raise ValueError(
                "PosteriorDiffusionEstimator trains with the PosteriorLoss; "
                f"got loss_fn={loss_name!r}"
            )
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
