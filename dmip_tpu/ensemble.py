"""Trial-parallel (ensemble) training for grid search.

The reference's grid search trains trials strictly sequentially
(model_selection.py:16-64).  Most of a grid's trials share one jaxpr
structure — same model/loss/metrics, differing only in the scalar
regularization weights lam/lam2 — so on TPU they can train as ONE program:
the trial axis becomes a leading vmap axis over (params, opt_state, lam,
lam2), batches and keys are shared (exactly the schedule each sequential
trial would have seen, since the reference re-uses the same seed per trial),
and the whole multi-epoch scan stays a single jitted dispatch.  On a device
mesh the trial axis shards: each chip trains n_trials/n_devices trials with
zero cross-trial communication.

Per-trial results are numerically equivalent to the sequential runs (tested
in tests/test_ensemble.py); K trials cost ~1 trial's wall-clock on K chips
(the trial axis shards with zero cross-trial communication).  On ONE chip,
stacking pays only while a single trial leaves the chip idle — measured at
the 512x3/batch-1000 reference workload (bench.py --ensemble, BENCHMARKS.md
training-roofline section): DSM (26% single-trial MFU) gains 2.0x at K=9,
PINN (56% single-trial MFU) measures 0.74x — so single-chip grids should
stack DSM-like blocks and run near-saturated losses sequentially.
"""

from __future__ import annotations

import dataclasses
import time
from typing import Any, Callable, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import optax

from .models.diffusion import DiffusionModel, LossConfig

Array = jax.Array


def init_ensemble(model: DiffusionModel, key: Array, n_trials: int):
    """Stack n_trials copies of one init — the sequential grid re-inits every
    trial from the same key (run_grid_search_*.py), so identical starts are
    the parity-preserving choice."""
    p = model.init(key)
    return jax.tree_util.tree_map(
        lambda a: jnp.broadcast_to(a[None], (n_trials,) + a.shape), p
    )


def trial_params(ens_params, i: int):
    """Extract trial i's parameter pytree from the stacked ensemble."""
    return jax.tree_util.tree_map(lambda a: a[i], ens_params)


def pad_trials(lams: Sequence[float], lam2s: Sequence[float], multiple: int):
    """Pad the trial list to a mesh-divisible length by repeating the last
    trial; returns (lams, lam2s, n_valid)."""
    n = len(lams)
    rem = (-n) % multiple
    lams = list(lams) + [lams[-1]] * rem
    lam2s = list(lam2s) + [lam2s[-1]] * rem
    return jnp.asarray(lams, jnp.float32), jnp.asarray(lam2s, jnp.float32), n


def _make_trial_step(model, cfg, optimizer, loss_kwargs, skip_nonfinite):
    """One trial's (params, opt_state) update with traced lam/lam2 scalars
    (sound because every loss uses them multiplicatively — dmip_tpu.losses)."""
    loss_kwargs = dict(loss_kwargs or {})

    def loss_with(params, key, x, y, lam, lam2):
        cfg_rt = dataclasses.replace(cfg, lam=lam, lam2=lam2)
        return model.make_loss_fn(cfg_rt, **loss_kwargs)(params, key, x, y)

    def trial_step(params, opt_state, key, x, y, lam, lam2):
        (loss, info), grads = jax.value_and_grad(loss_with, has_aux=True)(
            params, key, x, y, lam, lam2
        )
        updates, new_opt_state = optimizer.update(grads, opt_state, params)
        new_params = optax.apply_updates(params, updates)
        if skip_nonfinite:
            finite = jnp.all(
                jnp.stack([
                    jnp.all(jnp.isfinite(g))
                    for g in jax.tree_util.tree_leaves(grads)
                ])
            )
            keep = lambda new, old: jax.tree_util.tree_map(
                lambda a, b: jnp.where(finite, a, b), new, old
            )
            new_params = keep(new_params, params)
            new_opt_state = keep(new_opt_state, opt_state)
        return new_params, new_opt_state, loss, info

    return trial_step


def _epochs_loop(step, batch_fn, epochs_per_call: int):
    """The shared multi-epoch/batch scan around a per-batch trial update.

    ``step(params, opt_state, key, x, y, lams, lam2s)`` may be the vmapped
    K-trial step (lams a (K,) array) or a single trial's plain step (lams a
    scalar) — the loop only threads them through.  The key/batch schedule
    matches :func:`dmip_tpu.train.make_epoch_fn` exactly.
    """

    def epochs(params, opt_state, key, epoch0, lams, lam2s,
               n_active=epochs_per_call):
        def one_epoch(carry, inp):
            j, ekey = inp
            params, opt_state = carry
            kdata, kscan = jax.random.split(ekey)
            xb, yb = batch_fn(kdata)
            keys = jax.random.split(kscan, xb.shape[0])

            def body(c, binp):
                p, o = c
                k, x, y = binp
                p, o, loss, info = step(p, o, k, x, y, lams, lam2s)
                return (p, o), (loss, info)

            new_carry, (losses, infos) = jax.lax.scan(
                body, (params, opt_state), (keys, xb, yb)
            )
            active = j < n_active
            keep = jax.tree_util.tree_map(
                lambda a, b: jnp.where(active, a, b), new_carry, carry
            )
            # per-trial means over the epoch's batches
            return keep, (jnp.mean(losses, axis=0),
                          {k: jnp.mean(v, axis=0) for k, v in infos.items()})

        js = jnp.arange(epochs_per_call)
        keys = jax.vmap(lambda j: jax.random.fold_in(key, epoch0 + j))(js)
        (params, opt_state), (losses, infos) = jax.lax.scan(
            one_epoch, (params, opt_state), (js, keys)
        )
        return params, opt_state, losses, infos

    return epochs


def make_ensemble_epoch_fn(
    model: DiffusionModel,
    cfg: LossConfig,
    optimizer,
    batch_fn: Callable[..., Tuple[Array, Array]],
    epochs_per_call: int = 1,
    loss_kwargs: Optional[Dict[str, Any]] = None,
    mesh=None,
    axis_name: str = "data",
    donate: bool = True,
    skip_nonfinite: bool = True,
):
    """Build the jitted multi-epoch ensemble step.

    Returns epochs(ens_params, ens_opt_state, key, epoch0, lams, lam2s,
    n_active) -> (ens_params, ens_opt_state, losses (epochs_per_call, K),
    infos dict of (epochs_per_call, K)).

    ``lams``/``lam2s`` are traced (K,) arrays: cfg's lam/lam2 are replaced
    per trial at trace time, which is sound because every loss uses them
    multiplicatively (dmip_tpu.losses).  The key/batch schedule matches
    :func:`dmip_tpu.train.make_epoch_fn` exactly, so trial k here equals a
    sequential run with lam=lams[k].
    """
    trial_step = _make_trial_step(model, cfg, optimizer, loss_kwargs,
                                  skip_nonfinite)

    # trial axis: params/opt_state/lam/lam2 mapped, (key, batch) shared
    vstep = jax.vmap(trial_step, in_axes=(0, 0, None, None, None, 0, 0))

    epochs = _epochs_loop(vstep, batch_fn, epochs_per_call)

    if mesh is None:
        return jax.jit(epochs, donate_argnums=(0, 1) if donate else ())

    from jax.sharding import NamedSharding, PartitionSpec as P

    trial_sh = NamedSharding(mesh, P(axis_name))
    repl = NamedSharding(mesh, P())
    # losses/infos are (epochs_per_call, K): trial axis is dim 1
    hist_sh = NamedSharding(mesh, P(None, axis_name))
    return jax.jit(
        epochs,
        in_shardings=(trial_sh, trial_sh, repl, repl, trial_sh, trial_sh,
                      repl),
        out_shardings=(trial_sh, trial_sh, hist_sh, hist_sh),
        donate_argnums=(0, 1) if donate else (),
    )


def make_pinned_ensemble_epoch_fn(
    model: DiffusionModel,
    cfg: LossConfig,
    optimizer,
    batch_fn: Callable[..., Tuple[Array, Array]],
    mesh,
    epochs_per_call: int = 1,
    loss_kwargs: Optional[Dict[str, Any]] = None,
    axis_name: str = "data",
    donate: bool = True,
    skip_nonfinite: bool = True,
):
    """Device-PINNED trial scheduling: one trial per device via ``shard_map``.

    The vmapped ensemble (:func:`make_ensemble_epoch_fn`) stacks the trial
    axis into every weight matmul — a win only while a single trial leaves
    the chip idle (DSM: 2.0x at K=9 single-chip), a measured 0.74x SLOWDOWN
    for near-saturated losses like PINN (bench.py --ensemble, round 4).
    Here each device instead runs the UNCHANGED single-trial program — the
    same jaxpr a sequential run compiles, no stacked-weight batching — on
    its own shard of the trial axis, with zero cross-trial communication:
    K = mesh.size trials cost one trial's wall-clock regardless of how
    saturated the loss is.  This is the sharded-trials design SURVEY.md §7
    (item 8) calls for, replacing the reference's sequential
    model_selection.py:16 loop.

    Trial count must equal mesh.size (pad with :func:`pad_trials`); the
    key/batch schedule is shared, so trial k's result equals the sequential
    run's (equality-tested in tests/test_ensemble.py).  Same signature as
    :func:`make_ensemble_epoch_fn`'s return.
    """
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    trial_step = _make_trial_step(model, cfg, optimizer, loss_kwargs,
                                  skip_nonfinite)
    epochs1 = _epochs_loop(trial_step, batch_fn, epochs_per_call)

    def local_body(params, opt_state, key, epoch0, lams, lam2s, n_active):
        # local shapes: leading trial axis of size K / mesh.size == 1
        squeeze = lambda t: jax.tree_util.tree_map(lambda a: a[0], t)
        p, o, losses, infos = epochs1(
            squeeze(params), squeeze(opt_state), key, epoch0,
            lams[0], lam2s[0], n_active,
        )
        expand = lambda t: jax.tree_util.tree_map(lambda a: a[None], t)
        # losses: (epochs_per_call,) -> (epochs_per_call, 1) local trial col
        return (expand(p), expand(o), losses[:, None],
                {k: v[:, None] for k, v in infos.items()})

    ax = axis_name
    sharded = shard_map(
        local_body,
        mesh=mesh,
        in_specs=(P(ax), P(ax), P(), P(), P(ax), P(ax), P()),
        out_specs=(P(ax), P(ax), P(None, ax), P(None, ax)),
        check_vma=False,
    )

    def epochs(params, opt_state, key, epoch0, lams, lam2s,
               n_active=epochs_per_call):
        if lams.shape[0] != mesh.size:
            raise ValueError(
                f"pinned ensemble needs n_trials == mesh.size "
                f"({lams.shape[0]} != {mesh.size}); pad with pad_trials()"
            )
        return sharded(params, opt_state, key,
                       jnp.asarray(epoch0, jnp.int32), lams, lam2s,
                       jnp.asarray(n_active, jnp.int32))

    return jax.jit(epochs, donate_argnums=(0, 1) if donate else ())


def ensemble_fit(
    epoch_fn,
    ens_params,
    optimizer,
    key: Array,
    num_epochs: int,
    lams: Array,
    lam2s: Array,
    epochs_per_call: int = 1,
    log_every: int = 50,
    desc: str = "ensemble",
    mesh=None,
    axis_name: str = "data",
):
    """Python-level driver for the ensemble scan.

    Returns (ens_params, loss_history (num_epochs, K)).  The caller extracts
    per-trial params with :func:`trial_params` and writes per-trial logs
    from the history.
    """
    import numpy as np

    # vmap(init): per-trial optimizer state (adam's count is (K,), etc.)
    opt_state = jax.vmap(optimizer.init)(ens_params)
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        trial_sh = NamedSharding(mesh, P(axis_name))
        ens_params = jax.device_put(ens_params, trial_sh)
        opt_state = jax.device_put(opt_state, trial_sh)
        lams = jax.device_put(lams, trial_sh)
        lam2s = jax.device_put(lam2s, trial_sh)

    history = []
    t0 = time.time()
    n_calls = -(-num_epochs // epochs_per_call)
    epoch = 0
    for c in range(n_calls):
        n_active = min(epochs_per_call, num_epochs - epoch)
        ens_params, opt_state, losses, _infos = epoch_fn(
            ens_params, opt_state, key, jnp.asarray(epoch, jnp.int32),
            lams, lam2s, jnp.asarray(n_active, jnp.int32),
        )
        losses = np.asarray(jax.device_get(losses))  # (epochs_per_call, K)
        history.append(losses[:n_active])
        epoch += n_active
        if log_every and (c % max(log_every // epochs_per_call, 1) == 0
                          or c == n_calls - 1):
            rate = epoch / (time.time() - t0)
            print(
                f"[{desc}] epoch {epoch}/{num_epochs} "
                f"mean-loss={float(losses[n_active - 1].mean()):.4f} "
                f"({rate:.1f} epochs/s x {losses.shape[1]} trials)",
                flush=True,
            )
    return ens_params, np.concatenate(history, axis=0)


def make_train_many(
    batch_fn: Callable[..., Tuple[Array, Array]],
    k_init: Array,
    k_train: Array,
    lr: float,
    n_epochs: int,
    epochs_per_call: int = 1,
    loss_kwargs: Optional[Dict[str, Any]] = None,
    grad_clip: Optional[float] = None,
    mesh="auto",
    write_logs: bool = True,
    backend: str = "auto",
):
    """Build the ``train_many`` callable for :func:`dmip_tpu.gridsearch.grid_search`.

    Same (key, init, optimizer, epoch-count) schedule as the drivers'
    sequential ``train_fn``, so per-trial results match sequential training.
    mesh="auto": shard the trial axis over all visible devices (trial count
    is padded to a mesh-divisible length by repeating the last trial).

    ``backend``: 'vmap' stacks the trial axis into every op
    (:func:`make_ensemble_epoch_fn` — best for low-MFU losses like DSM);
    'pinned' runs one trial per device as the unchanged sequential program
    (:func:`make_pinned_ensemble_epoch_fn` — best for saturated losses like
    PINN, K == mesh.size per wave); 'auto' picks 'pinned' when a multi-device
    mesh is available and K fills it, else 'vmap'.
    """

    def train_many(model, loss_cfg, full_cfgs, train_dirs, log_dirs):
        from .train import build_optimizer

        lams = [float(fc.get("lam", 1.0)) for fc in full_cfgs]
        lam2s = [float(fc.get("lam2", 1.0)) for fc in full_cfgs]
        m = mesh
        if m == "auto":
            from .parallel.mesh import get_mesh

            m = get_mesh() if len(jax.devices()) > 1 else None
        multiple = m.size if m is not None else 1
        lams_a, lam2s_a, n_valid = pad_trials(lams, lam2s, multiple)

        be = backend
        if be == "auto":
            be = "pinned" if m is not None else "vmap"
        ens = init_ensemble(model, k_init, lams_a.shape[0])
        optimizer = build_optimizer(lr, grad_clip)
        if be == "pinned":
            epoch_fn = make_pinned_ensemble_epoch_fn(
                model, loss_cfg, optimizer, batch_fn, m, epochs_per_call,
                loss_kwargs,
            )
        else:
            epoch_fn = make_ensemble_epoch_fn(
                model, loss_cfg, optimizer, batch_fn, epochs_per_call,
                loss_kwargs, mesh=m,
            )
        desc = f"ensemble[{be}]:" + (
            __import__("os").path.basename(train_dirs[0]) if train_dirs else ""
        )
        if be == "pinned":
            # one trial per device, ceil(K/D) sequential WAVES of D trials
            # (the epoch_fn jaxpr is wave-invariant, so compile once)
            import numpy as np

            D = m.size
            parts, hists = [], []
            for w0 in range(0, lams_a.shape[0], D):
                sl = slice(w0, w0 + D)
                ens_w = jax.tree_util.tree_map(lambda a: a[sl], ens)
                ens_w, hist_w = ensemble_fit(
                    epoch_fn, ens_w, optimizer, k_train, n_epochs,
                    lams_a[sl], lam2s_a[sl],
                    epochs_per_call=epochs_per_call, mesh=m,
                    desc=f"{desc}:wave{w0 // D}",
                )
                parts.append(jax.device_get(ens_w))
                hists.append(hist_w)
            ens = jax.tree_util.tree_map(
                lambda *xs: np.concatenate(xs, axis=0), *parts
            )
            hist = np.concatenate(hists, axis=1)
        else:
            ens, hist = ensemble_fit(
                epoch_fn, ens, optimizer, k_train, n_epochs, lams_a, lam2s_a,
                epochs_per_call=epochs_per_call, mesh=m, desc=desc,
            )
        if write_logs:
            from .utils.metrics import MetricsWriter

            for i, ld in enumerate(log_dirs):
                with MetricsWriter(ld) as w:
                    for e in range(hist.shape[0]):
                        w.scalar("Train/Loss", float(hist[e, i]), e)
        ens = jax.device_get(ens)
        out = [trial_params(ens, i) for i in range(n_valid)]
        # per-trial checkpoints: finalists can be re-evaluated (e.g. with the
        # full protocol) without retraining, and a crash after training
        # loses nothing
        import os as _os

        from .checkpoints import save_checkpoint

        for i, tdir in enumerate(train_dirs):
            save_checkpoint(
                _os.path.join(tdir, "checkpoint"), out[i],
                step=n_epochs, key=k_train,
                extra={"lam": float(lams[i]), "lam2": float(lam2s[i])},
            )
        return out

    return train_many
