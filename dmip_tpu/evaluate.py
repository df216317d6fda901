"""Evaluation harnesses: posterior-sample histograms, KL, NLL, score-MSE.

Re-specifies the ``evaluate`` functions of the reference drivers
(main_diffusion_linear.py:53-137, main_diffusion_scatterometry.py:40-124):
per test condition y, n_repeats x (E-M posterior sampling + ground-truth
samples), 75^d histograms on a fixed box, eps-smoothed forward (and reverse)
histogram KL, NLL under the true posterior / MCMC energy, and score-MSE at
t=0 ("Fisher divergence").

TPU-first: the reference loops ys on the host and histograms with numpy;
here the entire per-y pipeline (10 repeats x 30k samples x 200 E-M steps +
fused bucketize/scatter-add histograms) is one jitted function, and the
Python level only accumulates tiny (nbins^d,) arrays and scalars.
"""

from __future__ import annotations

import csv
import os
import time
from typing import Callable, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .models.diffusion import DiffusionModel

Array = jax.Array


# ---------------------------------------------------------------------------
# Device-side histograms + KL
# ---------------------------------------------------------------------------


def histogramdd_flat(x: Array, nbins: int, lo: float, hi: float) -> Array:
    """d-dimensional fixed-range histogram, flattened to (nbins**d,).

    Matches np.histogramdd semantics on a uniform grid: out-of-range points
    are dropped; points exactly on the upper edge land in the last bin.
    Implemented as fused bucketize + scatter-add (SURVEY.md §7 'hard parts').
    """
    d = x.shape[-1]
    width = (hi - lo) / nbins
    idx = jnp.floor((x - lo) / width).astype(jnp.int32)
    idx = jnp.clip(idx, 0, nbins - 1)
    in_range = jnp.all((x >= lo) & (x <= hi), axis=-1)
    flat = jnp.zeros(x.shape[0], jnp.int32)
    for i in range(d):
        flat = flat * nbins + idx[..., i]
    weights = in_range.astype(jnp.float32)
    return jnp.zeros(nbins**d, jnp.float32).at[flat].add(weights)


def kl_pair(
    hist_true: Array, hist_model: Array, epsilon: float = 1e-10
) -> Tuple[Array, Array]:
    """(forward KL, reverse KL) with the reference's eps-smooth+renormalize.

    main_diffusion_linear.py:109-117 / main_diffusion_scatterometry.py:94-102:
    normalize, add eps, renormalize, sum rel_entr.
    """
    # guard empty histograms (all samples out of range -> uniform-eps dist
    # instead of the reference's nan)
    p = hist_true / jnp.maximum(jnp.sum(hist_true), 1.0) + epsilon
    q = hist_model / jnp.maximum(jnp.sum(hist_model), 1.0) + epsilon
    p = p / jnp.sum(p)
    q = q / jnp.sum(q)
    kl = jnp.sum(p * (jnp.log(p) - jnp.log(q)))
    kl_rev = jnp.sum(q * (jnp.log(q) - jnp.log(p)))
    return kl, kl_rev


# ---------------------------------------------------------------------------
# Per-y evaluation kernels
# ---------------------------------------------------------------------------

# Jitted eval kernels keyed by (model, workload shape): grid searches call
# evaluate_* once per trial with identical structure — without the cache each
# trial would recompile the whole per-y pipeline (~30-60s each on the TPU
# tunnel).  Models are frozen dataclasses (hashable by value); callables are
# keyed by id (stable within a driver run).
_KERNEL_CACHE: Dict[Tuple, Callable] = {}


def _cached(key: Tuple, build: Callable[[], Callable]) -> Callable:
    if key not in _KERNEL_CACHE:
        _KERNEL_CACHE[key] = build()
    return _KERNEL_CACHE[key]


def sliced_w2(key: Array, x: Array, y: Array, n_proj: int = 128) -> Array:
    """Sliced 2-Wasserstein distance between two sample sets.

    Beyond the reference's metric set (BASELINE.json's north star asks for
    KL/W2 parity): average over random 1-D projections of the exact 1-D
    W2 (sorted-quantile) distance.  Both sets must have equal size.
    """
    d = x.shape[-1]
    dirs = jax.random.normal(key, (n_proj, d))
    dirs = dirs / jnp.linalg.norm(dirs, axis=1, keepdims=True)
    px = jnp.sort(x @ dirs.T, axis=0)  # (n, n_proj)
    py = jnp.sort(y @ dirs.T, axis=0)
    return jnp.sqrt(jnp.mean((px - py) ** 2))


def make_eval_y_linear(
    model: DiffusionModel,
    problem,
    n_samples_x: int,
    n_repeats: int,
    num_steps: int = 200,
    nbins: int = 75,
    xlim: Tuple[float, float] = (-3.5, 3.5),
    method: str = "auto",
):
    """Jitted per-y evaluation for the linear problem (analytic oracle).

    Returns eval_y(params, key, y) -> dict of per-y statistics; histograms
    summed over repeats, NLL / MSE averaged (reference
    main_diffusion_linear.py:65-131).  ``method`` selects the sampler
    (model.sample: 'auto'/'pallas'/'xla'/'heun').
    """
    lo, hi = xlim
    base = model.sde.base

    def one_repeat(params, key, y):
        k1, k2, k3 = jax.random.split(key, 3)
        x_pred = model.sample(params, k1, y, n_samples_x, num_steps,
                              method=method)
        x_true = problem.sample_posterior(k2, y, n_samples_x)
        w2 = sliced_w2(k3, x_pred, x_true)

        # score MSE at t=0 vs analytic posterior score
        t0 = jnp.zeros((n_samples_x, 1))
        g0 = base.g(t0)
        ys_tiled = jnp.broadcast_to(y, (n_samples_x, y.shape[-1]))
        # CDiffE's joint net outputs xdim+ydim; score-MSE compares the
        # x-block (the reference eval assumes CDE and would shape-error)
        score_pred = (
            model.apply_a(params, x_true, ys_tiled, t0) / g0
        )[:, : x_true.shape[-1]]
        score_true = problem.score_posterior(x_true, ys_tiled)
        mse = jnp.mean(jnp.sum((score_pred - score_true) ** 2, axis=1))

        hist_t = histogramdd_flat(x_true, nbins, lo, hi)
        hist_p = histogramdd_flat(x_pred, nbins, lo, hi)
        nll_t = -jnp.mean(problem.posterior_log_prob(x_true, y))
        nll_p = -jnp.mean(problem.posterior_log_prob(x_pred, y))
        return hist_t, hist_p, nll_t, nll_p, mse, w2, x_pred, x_true

    def eval_y_raw(params, key, y):
        keys = jax.random.split(key, n_repeats)
        hist_t, hist_p, nll_t, nll_p, mse, w2, x_pred, x_true = jax.lax.map(
            lambda k: one_repeat(params, k, y), keys
        )
        kl, kl_rev = kl_pair(jnp.sum(hist_t, 0), jnp.sum(hist_p, 0))
        return dict(
            kl=kl,
            kl_reverse=kl_rev,
            nll_true=jnp.mean(nll_t),
            nll_model=jnp.mean(nll_p),
            mse_score=jnp.mean(mse),
            w2=jnp.mean(w2),
            x_pred_last=x_pred[-1],
            x_true_last=x_true[-1],
        )

    eval_y = jax.jit(eval_y_raw)
    eval_y.raw = eval_y_raw
    return eval_y


def make_eval_y_scatterometry(
    model: DiffusionModel,
    forward_model: Callable[[Array], Array],
    fparams: Dict[str, float],
    score_posterior_fn,
    n_samples_x: int,
    num_steps: int = 200,
    nbins: int = 75,
    xlim: Tuple[float, float] = (-1.2, 1.2),
    method: str = "auto",
):
    """Jitted per-(y, repeat) evaluation against precomputed MCMC GT samples.

    GT arrays come from disk (one per repeat), so the kernel takes one
    repeat's x_true; the caller accumulates over repeats
    (reference main_diffusion_scatterometry.py:52-122).
    """
    from .problems.scatterometry import get_log_posterior

    lo, hi = xlim
    base = model.sde.base
    a, b, lambd_bd = fparams["a"], fparams["b"], fparams["lambd_bd"]

    def eval_y_repeat_raw(params, key, y, x_true):
        # GT arrays may carry a different sample count than n_samples_x
        # (e.g. full 30k MCMC repeats against a reduced-eval run), so y is
        # tiled per consumer array rather than once.
        def tiled(n):
            return jnp.broadcast_to(y, (n, y.shape[-1]))

        def energy(x):
            return get_log_posterior(
                x, forward_model, a, b, tiled(x.shape[0]), lambd_bd
            )

        k_sample, k_w2 = jax.random.split(key)
        x_pred = model.sample(params, k_sample, y, n_samples_x, num_steps,
                              method=method)
        # sliced-W2 vs the GT samples (floor-free complement to the sparse
        # 75^3-histogram KL; BASELINE.md's KL/W2 north star).  The 1-D
        # quantile distance needs equal counts: truncate both to the min.
        n_w2 = min(n_samples_x, int(x_true.shape[0]))
        w2 = sliced_w2(k_w2, x_pred[:n_w2], x_true[:n_w2])

        t0 = jnp.zeros((x_true.shape[0], 1))
        g0 = base.g(t0)
        ys_true = tiled(x_true.shape[0])
        score_pred = (
            model.apply_a(params, x_true, ys_true, t0) / g0
        )[:, : x_true.shape[-1]]
        score_true = score_posterior_fn(x_true, ys_true)
        mse = jnp.mean(jnp.sum((score_pred - score_true) ** 2, axis=1))

        hist_t = histogramdd_flat(x_true, nbins, lo, hi)
        hist_p = histogramdd_flat(x_pred, nbins, lo, hi)
        nll_t = jnp.mean(energy(x_true))
        nll_p = jnp.mean(energy(x_pred))
        return dict(
            hist_true=hist_t, hist_model=hist_p, nll_true=nll_t,
            nll_model=nll_p, mse_score=mse, w2=w2, x_pred=x_pred,
        )

    eval_y_repeat = jax.jit(eval_y_repeat_raw)
    eval_y_repeat.raw = eval_y_repeat_raw
    return eval_y_repeat


def make_eval_many_linear(
    model: DiffusionModel,
    problem,
    n_samples_x: int,
    n_repeats: int,
    num_steps: int = 200,
    nbins: int = 75,
    xlim: Tuple[float, float] = (-3.5, 3.5),
    mesh=None,
    axis_name: str = "data",
    method: str = "auto",
):
    """Condition-sharded evaluation: vmap the per-y kernel over a chunk of
    ys, optionally sharding the chunk over a device mesh.

    The reference walks conditions one at a time on the host
    (main_diffusion_linear.py:65); here a chunk of conditions evaluates in
    one dispatch, and with a mesh each device owns chunk/n_devices
    conditions (the framework's multi-chip scale axis, SURVEY.md §5).
    Returns eval_many(params, keys, ys) -> per-y stat dict with leading axis
    len(ys); chunk length must divide the mesh size when sharded.
    """
    eval_y = make_eval_y_linear(
        model, problem, n_samples_x, n_repeats, num_steps, nbins, xlim,
        method=method,
    )

    def one(params, k, y):
        return {
            kk: vv
            for kk, vv in eval_y.raw(params, k, y).items()
            if not kk.startswith("x_")
        }

    def batched(params, keys, ys):
        if mesh is None:
            # lax.map (a scan), not vmap: one dispatch per chunk WITHOUT a
            # batching transform — the fused Pallas sampler has no vmap rule.
            return jax.lax.map(lambda kv: one(params, *kv), (keys, ys))
        return jax.vmap(lambda k, y: one(params, k, y))(keys, ys)

    if mesh is None:
        return jax.jit(batched)

    from jax.sharding import NamedSharding, PartitionSpec as P

    data_sh = NamedSharding(mesh, P(axis_name))
    repl = NamedSharding(mesh, P())
    return jax.jit(
        batched,
        in_shardings=(repl, data_sh, data_sh),
        out_shardings=repl,
    )


def make_eval_many_scatterometry(
    model: DiffusionModel,
    forward_model: Callable[[Array], Array],
    fparams: Dict[str, float],
    score_posterior_fn,
    n_samples_x: int,
    num_steps: int = 200,
    nbins: int = 75,
    xlim: Tuple[float, float] = (-1.2, 1.2),
    mesh=None,
    axis_name: str = "data",
    method: str = "auto",
):
    """Condition-sharded scatterometry evaluation: vmap the per-(y, repeat)
    kernel over a chunk of conditions, sharding the chunk over a mesh.

    The reference walks (condition, repeat) pairs one at a time on the host
    (main_diffusion_scatterometry.py:52); here one dispatch evaluates a whole
    condition chunk for one repeat, with each device owning
    chunk/n_devices conditions.  GT arrays are loaded host-side per chunk and
    arrive sharded alongside their conditions.  Returns
    eval_many(params, keys, ys, x_trues) -> per-condition stat dict
    (histograms included; x_pred dropped — fetch plots via the per-y kernel).
    """
    eval_yr = make_eval_y_scatterometry(
        model, forward_model, fparams, score_posterior_fn,
        n_samples_x, num_steps, nbins, xlim, method=method,
    )

    def one(params, k, y, xt):
        return {
            kk: vv
            for kk, vv in eval_yr.raw(params, k, y, xt).items()
            if kk != "x_pred"
        }

    def batched(params, keys, ys, x_trues):
        if mesh is None:
            # lax.map, not vmap: the fused Pallas sampler has no vmap rule
            return jax.lax.map(
                lambda kvx: one(params, *kvx), (keys, ys, x_trues)
            )
        return jax.vmap(lambda k, y, xt: one(params, k, y, xt))(
            keys, ys, x_trues
        )

    if mesh is None:
        return jax.jit(batched)

    from jax.sharding import NamedSharding, PartitionSpec as P

    data_sh = NamedSharding(mesh, P(axis_name))
    repl = NamedSharding(mesh, P())
    return jax.jit(
        batched,
        in_shardings=(repl, data_sh, data_sh, data_sh),
        out_shardings=repl,
    )


def gt_floor_scatterometry(
    gt_loader: Callable[[int, int], np.ndarray],
    n_conditions: int,
    n_repeats: int = 10,
    nbins: int = 75,
    xlim: Tuple[float, float] = (-1.2, 1.2),
    key: Optional[Array] = None,
) -> Dict[str, np.ndarray]:
    """Per-condition GT-vs-GT metric floor under the reference's protocol.

    Splits each condition's ``n_repeats`` ground-truth MCMC repeats into two
    disjoint halves and scores half A against half B with the same
    eps-smoothed histogram KL (and sliced-W2) the model evaluations use.
    TRUE posterior samples scoring, e.g., KL 1.19 +- 0.53 at 150k-vs-150k
    (BENCHMARKS.md) means single-digit model KLs are at the metric's
    resolution limit — this makes that floor reproducible in one call
    (round-2 verdict hygiene item; previously buried in
    tools/beat_snf_experiments.py).

    Returns dict of per-condition arrays: kl, kl_reverse, w2.
    """
    lo, hi = xlim
    if key is None:
        key = jax.random.PRNGKey(0)
    half = n_repeats // 2
    if half < 1:
        raise ValueError("need n_repeats >= 2 to split GT into halves")

    @jax.jit
    def hist(x):
        return histogramdd_flat(x, nbins, lo, hi)

    kls, kl_revs, w2s = [], [], []
    for i in range(n_conditions):
        a = np.concatenate([np.asarray(gt_loader(i, j), np.float32)
                            for j in range(half)])
        b = np.concatenate([np.asarray(gt_loader(i, j), np.float32)
                            for j in range(half, 2 * half)])
        ha = hist(jnp.asarray(a))
        hb = hist(jnp.asarray(b))
        kl, kl_rev = kl_pair(ha, hb)
        n = min(a.shape[0], b.shape[0])
        w2 = sliced_w2(jax.random.fold_in(key, i),
                       jnp.asarray(a[:n]), jnp.asarray(b[:n]))
        kls.append(float(kl))
        kl_revs.append(float(kl_rev))
        w2s.append(float(w2))
    return {
        "kl": np.asarray(kls),
        "kl_reverse": np.asarray(kl_revs),
        "w2": np.asarray(w2s),
    }


# ---------------------------------------------------------------------------
# Top-level harnesses (results.csv writers)
# ---------------------------------------------------------------------------


def _write_results_csv(path: str, columns: Dict[str, Sequence[float]]) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    keys = list(columns.keys())
    with open(path, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow([""] + keys)
        for i in range(len(columns[keys[0]])):
            w.writerow([i] + [columns[k][i] for k in keys])


def _resolve_eval_mesh(mesh, n_items: int):
    """'auto' -> a data mesh over all visible devices when >1 (and the
    work is wide enough to shard), an explicit Mesh, or None (sequential).

    Same policy as training (train.resolve_mesh) with an extra guard: a
    single condition can't be sharded over the condition axis."""
    from .train import resolve_mesh

    if mesh == "auto" and n_items <= 1:
        return None
    return resolve_mesh(mesh)


def evaluate_linear(
    model: DiffusionModel,
    params,
    problem,
    ys: Array,
    key: Array,
    out_dir: Optional[str] = None,
    plot_ys: Sequence[int] = (),
    n_samples_x: int = 5000,
    n_repeats: int = 10,
    num_steps: int = 200,
    nbins: int = 75,
    xlim: Tuple[float, float] = (-3.5, 3.5),
    verbose: bool = True,
    mesh="auto",
    method: str = "auto",
    chunk: Optional[int] = None,
) -> Tuple[float, float, float]:
    """Full linear evaluation; returns (mean KL, mean NLPD, mean score-MSE).

    Column layout of results.csv matches the reference
    (main_diffusion_linear.py:133-135: KL2, NLL_true, NLL_diffusion, MSE).

    ``mesh``: "auto" (default) shards the condition set over all visible
    devices via :func:`make_eval_many_linear` — the reference's per-y host
    loop (main_diffusion_linear.py:65) is the multi-chip scale axis
    (SURVEY.md §5).  Pass an explicit Mesh or None (sequential).  The per-y
    key schedule is identical in both paths, so results match.

    ``chunk``: on a SINGLE device, vmap ``chunk`` conditions into one
    dispatch (tunnel-latency amortization for grid-scale evaluation).
    """
    n_y = ys.shape[0]
    # Per-y keys drawn in the sequential order regardless of path.
    ykeys = []
    for _ in range(n_y):
        key, k = jax.random.split(key)
        ykeys.append(k)
    ykeys = jnp.stack(ykeys)

    use_mesh = _resolve_eval_mesh(mesh, n_y)
    kl_vals, nll_true, nll_model, mse_vals, w2_vals = [], [], [], [], []
    chunk_n = use_mesh.size if use_mesh is not None else (
        chunk if chunk and chunk > 1 and n_y > 1 else 0
    )
    if chunk_n:
        eval_many = _cached(
            ("lin_many", model, id(problem), n_samples_x, n_repeats,
             num_steps, nbins, xlim, use_mesh, method),
            lambda: make_eval_many_linear(
                model, problem, n_samples_x, n_repeats, num_steps, nbins,
                xlim, mesh=use_mesh, method=method,
            ),
        )
        if use_mesh is not None:
            from .parallel.mesh import batch_sharding, replicate

            data_sh = batch_sharding(use_mesh)
            params_r = jax.device_put(params, replicate(use_mesh))
            put = lambda arr: jax.device_put(arr, data_sh)
        else:
            params_r = params
            put = lambda arr: arr
        for c0 in range(0, n_y, chunk_n):
            idx = list(range(c0, min(c0 + chunk_n, n_y)))
            pad = chunk_n - len(idx)
            sel = idx + [idx[-1]] * pad  # pad by repeating; outputs discarded
            out = eval_many(
                params_r,
                put(ykeys[jnp.asarray(sel)]),
                put(ys[jnp.asarray(sel)]),
            )
            out = jax.device_get(out)
            for j in range(len(idx)):
                kl_vals.append(float(out["kl"][j]))
                nll_true.append(float(out["nll_true"][j]))
                nll_model.append(float(out["nll_model"][j]))
                mse_vals.append(float(out["mse_score"][j]))
                w2_vals.append(float(out["w2"][j]))
    eval_y = _cached(
        ("lin_y", model, id(problem), n_samples_x, n_repeats, num_steps,
         nbins, xlim, method),
        lambda: make_eval_y_linear(
            model, problem, n_samples_x, n_repeats, num_steps, nbins, xlim,
            method=method,
        ),
    )
    for i in range(n_y):
        if not chunk_n:
            out = eval_y(params, ykeys[i], ys[i])
            kl_vals.append(float(out["kl"]))
            nll_true.append(float(out["nll_true"]))
            nll_model.append(float(out["nll_model"]))
            mse_vals.append(float(out["mse_score"]))
            w2_vals.append(float(out["w2"]))
        elif not (out_dir is not None and i in plot_ys):
            continue
        if out_dir is not None and i in plot_ys:
            from .utils.plotting import plot_density

            if chunk_n:
                out = eval_y(params, ykeys[i], ys[i])  # same key: same samples
            for tag, arr in (("true", out["x_true_last"]), ("diffusion", out["x_pred_last"])):
                plot_density(
                    np.asarray(arr), nbins, limits=xlim, xticks=list(xlim),
                    size=(12, 12), labelsize=30, show_mean=True,
                    fname=os.path.join(out_dir, f"posterior-{tag}-{i}.svg"),
                )
    kl_arr = np.asarray(kl_vals)
    nlpd = np.abs(np.asarray(nll_true) - np.asarray(nll_model))
    if out_dir is not None:
        _write_results_csv(
            os.path.join(out_dir, "results.csv"),
            {
                "KL2": kl_vals,
                "NLL_true": nll_true,
                "NLL_diffusion": nll_model,
                "MSE": mse_vals,
                "W2": w2_vals,
            },
        )
    if verbose:
        var = np.sum((kl_arr - kl_arr.mean()) ** 2) / len(kl_arr)
        print(f"KL2: {kl_arr.mean()} +- {var}")
    return float(kl_arr.mean()), float(nlpd.mean()), float(np.mean(mse_vals))


def evaluate_scatterometry(  # noqa: C901 — mirrors the reference's two-path walk
    model: DiffusionModel,
    params,
    forward_model,
    fparams: Dict[str, float],
    score_posterior_fn,
    ys: Array,
    gt_loader: Callable[[int, int], np.ndarray],
    key: Array,
    out_dir: Optional[str] = None,
    plot_ys: Sequence[int] = (),
    n_samples_x: int = 30000,
    n_repeats: int = 10,
    num_steps: int = 200,
    nbins: int = 75,
    xlim: Tuple[float, float] = (-1.2, 1.2),
    verbose: bool = True,
    mesh="auto",
    method: str = "auto",
    chunk: Optional[int] = None,
    progress_every: int = 0,
) -> Tuple[float, float, float]:
    """Scatterometry evaluation against MCMC ground truth.

    ``progress_every=N`` prints a flushed heartbeat every N conditions with
    the running rate — long protocols on slow sampling paths are otherwise
    silent for an hour+ on the tunnel and indistinguishable from a hung
    remote compile.  (The guided DPS/ΠGDM drifts now have fused kernels,
    ops/dps_kernel.py, so their full protocols run in minutes.)

    ``gt_loader(i, j)`` returns the (n_samples_x, 3) GT array for condition i,
    repeat j (reference datasets.get_gt_samples_scatterometry).  Returns
    (mean KL, mean NLPD, mean score-MSE); results.csv columns match
    main_diffusion_scatterometry.py:119-121.

    ``mesh``: "auto" (default) shards each repeat's condition chunk over all
    visible devices via :func:`make_eval_many_scatterometry`; GT arrays are
    loaded host-side per chunk.  The per-(condition, repeat) key schedule is
    identical in both paths, so results match the sequential walk.

    ``chunk``: on a SINGLE device (no mesh), vmap ``chunk`` conditions into
    one dispatch — per-dispatch tunnel latency otherwise dominates grid-scale
    evaluation (135 trials x 100 ys x repeats).  With a mesh the chunk is the
    mesh size.
    """
    n_y = ys.shape[0]
    # (i, j) keys drawn in the sequential order regardless of path.
    ykeys = []
    for _ in range(n_y * n_repeats):
        key, k = jax.random.split(key)
        ykeys.append(k)
    ykeys = jnp.stack(ykeys).reshape(n_y, n_repeats, -1)

    use_mesh = _resolve_eval_mesh(mesh, n_y)
    fp_key = tuple(sorted(fparams.items()))
    eval_yr = _cached(
        ("scat_y", model, id(forward_model), id(score_posterior_fn), fp_key,
         n_samples_x, num_steps, nbins, xlim, method),
        lambda: make_eval_y_scatterometry(
            model, forward_model, fparams, score_posterior_fn,
            n_samples_x, num_steps, nbins, xlim, method=method,
        ),
    )
    kl_vals, kl_rev_vals, nll_true, nll_model, mse_vals = [], [], [], [], []
    w2_vals = []
    t_start = time.time()

    prev_done = [0]

    def _progress(done: int) -> None:
        # Fire on crossing a progress_every boundary, not on exact multiples:
        # the chunked path reports done in chunk_n strides, which may never
        # hit a multiple of progress_every.
        crossed = (
            progress_every
            and done // progress_every > prev_done[0] // progress_every
        )
        prev_done[0] = done
        if progress_every and (crossed or done == n_y):
            rate = done / max(time.time() - t_start, 1e-9)
            print(
                f"[eval-scat] {done}/{n_y} conditions "
                f"({rate:.2f} cond/s, {n_repeats} repeats)",
                flush=True,
            )

    chunk_n = use_mesh.size if use_mesh is not None else (
        chunk if chunk and chunk > 1 and n_y > 1 else 0
    )
    if chunk_n:
        eval_many = _cached(
            ("scat_many", model, id(forward_model), id(score_posterior_fn),
             fp_key, n_samples_x, num_steps, nbins, xlim, use_mesh, method),
            lambda: make_eval_many_scatterometry(
                model, forward_model, fparams, score_posterior_fn,
                n_samples_x, num_steps, nbins, xlim, mesh=use_mesh,
                method=method,
            ),
        )
        if use_mesh is not None:
            from .parallel.mesh import batch_sharding, replicate

            data_sh = batch_sharding(use_mesh)
            params_r = jax.device_put(params, replicate(use_mesh))
            put = lambda arr: jax.device_put(arr, data_sh)
        else:
            params_r = params
            put = lambda arr: arr
        kl_pair_v = jax.jit(jax.vmap(kl_pair))
        for c0 in range(0, n_y, chunk_n):
            idx = list(range(c0, min(c0 + chunk_n, n_y)))
            pad = chunk_n - len(idx)
            sel = idx + [idx[-1]] * pad  # pad by repeating; outputs discarded
            # Accumulate ON DEVICE across repeats and reduce the histograms
            # to KLs on device: device_get-ing the (chunk, nbins^3) pair
            # every repeat moved ~8.4 GB per 100x10 full eval through the
            # TPU tunnel and dominated eval wall-clock (round-5 profile —
            # the metric kernels themselves are <10 ms/unit).  Only O(chunk)
            # scalars leave the device per chunk now.
            acc = None
            for j in range(n_repeats):
                x_true = jnp.stack([
                    jnp.asarray(gt_loader(i, j), jnp.float32) for i in sel
                ])
                out = eval_many(
                    params_r,
                    put(ykeys[jnp.asarray(sel), j]),
                    put(ys[jnp.asarray(sel)]),
                    put(x_true),
                )
                acc = out if acc is None else {
                    k: acc[k] + v for k, v in out.items()
                }
            kl, kl_rev = kl_pair_v(acc["hist_true"], acc["hist_model"])
            small = jax.device_get({
                "kl": kl, "kl_rev": kl_rev,
                "nll_t": acc["nll_true"] / n_repeats,
                "nll_p": acc["nll_model"] / n_repeats,
                "mse": acc["mse_score"] / n_repeats,
                "w2": acc["w2"] / n_repeats,
            })
            n = len(idx)
            kl_vals.extend(np.asarray(small["kl"][:n], np.float64).tolist())
            kl_rev_vals.extend(
                np.asarray(small["kl_rev"][:n], np.float64).tolist())
            nll_true.extend(np.asarray(small["nll_t"][:n], np.float64).tolist())
            nll_model.extend(np.asarray(small["nll_p"][:n], np.float64).tolist())
            mse_vals.extend(np.asarray(small["mse"][:n], np.float64).tolist())
            w2_vals.extend(np.asarray(small["w2"][:n], np.float64).tolist())
            _progress(min(c0 + chunk_n, n_y))

    for i in range(n_y):
        if chunk_n and not (out_dir is not None and i in plot_ys):
            continue
        hist_t_sum = jnp.zeros(nbins**3, jnp.float32)
        hist_p_sum = jnp.zeros(nbins**3, jnp.float32)
        nll_t = nll_p = mse = w2 = 0.0
        last = None
        for j in range(n_repeats):
            if chunk_n and j < n_repeats - 1:
                continue  # plots only need the last repeat's samples
            x_true = jnp.asarray(gt_loader(i, j), jnp.float32)
            out = eval_yr(params, ykeys[i, j], ys[i], x_true)
            hist_t_sum = hist_t_sum + out["hist_true"]
            hist_p_sum = hist_p_sum + out["hist_model"]
            nll_t += float(out["nll_true"]) / n_repeats
            nll_p += float(out["nll_model"]) / n_repeats
            mse += float(out["mse_score"]) / n_repeats
            w2 += float(out["w2"]) / n_repeats
            last = (x_true, out["x_pred"])
        if not chunk_n:
            kl, kl_rev = kl_pair(hist_t_sum, hist_p_sum)
            kl_vals.append(float(kl))
            kl_rev_vals.append(float(kl_rev))
            nll_true.append(nll_t)
            nll_model.append(nll_p)
            mse_vals.append(mse)
            w2_vals.append(w2)
            _progress(i + 1)
        if out_dir is not None and i in plot_ys and last is not None:
            from .utils.plotting import plot_density

            for tag, arr in (("mcmc", last[0]), ("diffusion", last[1])):
                plot_density(
                    np.asarray(arr), nbins, limits=xlim, xticks=[-1, 0, 1],
                    size=(12, 12), labelsize=30,
                    fname=os.path.join(out_dir, f"posterior-{tag}-{i}.svg"),
                )
    kl_arr = np.asarray(kl_vals)
    nlpd = np.abs(np.asarray(nll_model) - np.asarray(nll_true))
    if out_dir is not None:
        _write_results_csv(
            os.path.join(out_dir, "results.csv"),
            {
                "KL2": kl_vals,
                "KL_reverse": kl_rev_vals,
                "NLL_mcmc": nll_true,
                "NLL_diffusion": nll_model,
                "MSE": mse_vals,
                "W2": w2_vals,
            },
        )
    if verbose:
        var = np.sum((kl_arr - kl_arr.mean()) ** 2) / len(kl_arr)
        w2_note = f"  W2: {np.mean(w2_vals):.4f}" if w2_vals else ""
        print(f"KL2: {kl_arr.mean()} +- {var}{w2_note}")
    return float(kl_arr.mean()), float(nlpd.mean()), float(np.mean(mse_vals))
