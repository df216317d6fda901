"""Headline benchmark: reverse-SDE posterior-sampling throughput on TPU.

Workload (the reference's evaluation hot path, SURVEY.md §3.2 /
models/diffusion.py:27-46): Euler-Maruyama integration of the plug-in
reverse SDE with the flagship CDE score net (5 -> 512x3 -> 2, tanh),
batched over conditions — here 10 ys x 30,000 samples x 200 steps per
timed repetition, vmapped into a single jitted scan.

Baseline: the PyTorch-reference-style per-step Python-loop sampler measured
on this host (benchmarks/torch_baseline.json; regenerate with
``python benchmarks/baseline_torch.py``).  The reference publishes no
numbers (BASELINE.md), so the baseline is measured, not quoted.

Prints ONE JSON line:
  {"metric": "em_sample_steps_per_sec", "value": N, "unit": "sample_steps/s",
   "vs_baseline": ratio, ...}

``bench.py --train`` instead benchmarks TRAINING throughput (PINN loss on
the linear problem's shapes, whole-epoch jitted scans) against the measured
torch per-batch baseline (benchmarks/torch_train_baseline.json; regenerate
with ``python benchmarks/baseline_torch_train.py``) and prints its own
single JSON line, now with the roofline fields (TFLOP/s and %-of-v5e-peak
per loss via CPU-backend HLO cost analysis).

The DEFAULT invocation prints the headline line FIRST (unchanged format for
the driver's parser), then appends one labeled JSON line per extra mode
(--train, --refined, --mh, --dps) so the recorded BENCH_r{N}.json tail
shows the full throughput picture.  ``--main-only`` restores the
single-line behavior; each mode also runs standalone via its flag.
"""

from __future__ import annotations

import json
import os
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from dmip_tpu.train import get_model_from_args

N_YS = 10
N_SAMPLES = 30_000
N_STEPS = 200
N_REPS = 5

TRAIN_EPOCHS = 60
TRAIN_BATCHES = 90
TRAIN_BATCH = 1000

# TPU v5e (v5 lite) bf16 MXU peak per chip; the roofline denominator for
# the MFU fields.  Round-4 measurement: JAX's DEFAULT matmul precision on
# TPU already runs single-pass bf16 for f32 operands (forcing
# default_matmul_precision('bfloat16') changes DSM throughput <1%, while
# 'highest' costs 2.6x / 'tensorfloat32' 1.6x), so bf16 peak is the honest
# reference and there is no remaining precision lever in the train step.
V5E_BF16_PEAK = 197e12


def _train_flops_per_epoch(loss_name: str, extra_cfg: dict,
                           batch: int, n_batches: int) -> float:
    """FLOPs of one training EPOCH, counted by the CPU backend's HLO cost
    analysis of a single jitted train step (the TPU tunnel's cost_analysis
    returns bogus numbers, and XLA cost analysis does not multiply loop trip
    counts — so count ONE step and multiply by batches/epoch).  Verified
    against the analytic MLP count: DSM = 3 x forward =
    6 x MACs x batch (3.21 GFLOP/step-batch at 512x3/batch-1000 vs 3.17
    analytic); PINN measures ~6x DSM (its jvp/jacfwd/second-order grads)."""
    import optax

    from dmip_tpu.problems import LinearForwardProblem
    from dmip_tpu.train import make_train_step

    prob = LinearForwardProblem()
    model, cfg = get_model_from_args(
        {"model": "CDE", "loss_fn": loss_name,
         "hidden_layers": [512, 512, 512], **extra_cfg},
        {"xdim": 2, "ydim": 2},
    )
    loss_fn = model.make_loss_fn(cfg, initial_condition=prob.score_posterior)
    optimizer = optax.adam(1e-4)
    step = make_train_step(loss_fn, optimizer)
    key = jax.random.PRNGKey(0)
    params = jax.tree_util.tree_map(
        lambda x: jax.device_put(x, jax.local_devices(backend="cpu")[0]),
        model.init(key),
    )
    opt_state = optimizer.init(params)
    x = jnp.zeros((batch, 2))
    y = jnp.zeros((batch, 2))
    c = (
        jax.jit(step, backend="cpu")
        .lower(params, opt_state, key, x, y)
        .compile()
        .cost_analysis()
    )
    if isinstance(c, (list, tuple)):
        c = c[0]
    return float(c.get("flops", 0.0)) * n_batches


def _measure_train(loss_name: str, extra_cfg: dict,
                   batch: int = TRAIN_BATCH,
                   n_batches: int = TRAIN_BATCHES,
                   total_epochs: int = TRAIN_EPOCHS) -> float:
    """Epochs/s for one (loss) training variant on the reference workload
    shapes (main_diffusion_linear.py: 512x3 CDE, batch 1000, 90
    batches/epoch by default)."""
    import optax

    from dmip_tpu import data, train
    from dmip_tpu.problems import LinearForwardProblem

    prob = LinearForwardProblem()
    key = jax.random.PRNGKey(0)
    xs, ys = data.generate_dataset_linear(
        key, prob.xdim, prob.forward, n_batches * batch
    )
    model, cfg = get_model_from_args(
        {"model": "CDE", "loss_fn": loss_name,
         "hidden_layers": [512, 512, 512], **extra_cfg},
        {"xdim": 2, "ydim": 2},
    )
    loss_fn = model.make_loss_fn(cfg, initial_condition=prob.score_posterior)
    optimizer = optax.adam(1e-4)
    epc = 20
    epoch_fn = train.make_epoch_fn(
        loss_fn, optimizer,
        lambda k: data.linear_epoch_batches(k, xs, ys, prob.noise_std,
                                            batch),
        epochs_per_call=epc, donate=False,
    )
    params = model.init(key)
    opt_state = optimizer.init(params)
    # warmup / compile — two blocking calls (first post-init dispatch
    # through the tunnel costs 100ms+; see bench_refined)
    out = epoch_fn(params, opt_state, key, 0)
    jax.block_until_ready(out)
    out = epoch_fn(out[0], out[1], key, 0)
    jax.block_until_ready(out)

    t0 = time.time()
    params, opt_state = out[0], out[1]
    for c in range(total_epochs // epc):
        params, opt_state, losses, _ = epoch_fn(
            params, opt_state, key, (c + 1) * epc
        )
    jax.block_until_ready(losses)
    return total_epochs / (time.time() - t0)


def _measure_train_fused(total_epochs: int = TRAIN_EPOCHS) -> float:
    """Epochs/s for the fused Pallas DSM kernel (ops/dsm_train_kernel.py)
    on the same workload as ``_measure_train('DSM', {})``."""
    from dmip_tpu import data
    from dmip_tpu.ops.dsm_train_kernel import make_fused_dsm_epoch_fn
    from dmip_tpu.problems import LinearForwardProblem

    import optax

    prob = LinearForwardProblem()
    key = jax.random.PRNGKey(0)
    xs, ys = data.generate_dataset_linear(
        key, prob.xdim, prob.forward, TRAIN_BATCHES * TRAIN_BATCH
    )
    model, _ = get_model_from_args(
        {"model": "CDE", "loss_fn": "DSM", "hidden_layers": [512, 512, 512]},
        {"xdim": 2, "ydim": 2},
    )
    lr = 1e-4
    epc = 20
    epoch_fn = make_fused_dsm_epoch_fn(
        model, lr,
        lambda k: data.linear_epoch_batches(k, xs, ys, prob.noise_std,
                                            TRAIN_BATCH),
        epochs_per_call=epc, donate=False,
    )
    params = model.init(key)
    opt_state = optax.adam(lr).init(params)
    out = epoch_fn(params, opt_state, key, 0)
    jax.block_until_ready(out)
    out = epoch_fn(out[0], out[1], key, 0)
    jax.block_until_ready(out)
    t0 = time.time()
    p, o = out[0], out[1]
    for c in range(total_epochs // epc):
        p, o, losses, _ = epoch_fn(p, o, key, (c + 1) * epc)
    jax.block_until_ready(losses)
    return total_epochs / (time.time() - t0)


def bench_train() -> None:
    """DSM + PINN training throughput vs the measured torch baselines
    (benchmarks/torch_train_baseline.json), with the roofline accounting
    of round-4 verdict #3: TFLOP/s and %-of-peak per loss, plus the
    batch-scaling MFU ceiling (DSM at batch 16k — the measured saturation
    point of this 512x3 workload; see BENCHMARKS.md training roofline).
    Also reports the fused whole-epochs-on-chip Pallas DSM kernel
    (ops/dsm_train_kernel.py): it measures AT the XLA path's rate, the
    decisive evidence that batch-1000 training is bound by the per-step
    serial dependency chain + params-proportional VPU state work, not by
    HBM round-trips (BENCHMARKS.md round-4 train-step decomposition)."""
    pinn = _measure_train("PINNLoss", {"lam": 0.1, "lam2": 1.0})
    dsm = _measure_train("DSM", {})
    dsm_16k = _measure_train("DSM", {}, batch=16000, n_batches=5)
    try:
        dsm_fused = _measure_train_fused()
    except Exception:  # pragma: no cover - device-dependent
        dsm_fused = None

    try:
        dsm_fpe = _train_flops_per_epoch("DSM", {}, TRAIN_BATCH,
                                         TRAIN_BATCHES)
        pinn_fpe = _train_flops_per_epoch("PINNLoss",
                                          {"lam": 0.1, "lam2": 1.0},
                                          TRAIN_BATCH, TRAIN_BATCHES)
        dsm16_fpe = _train_flops_per_epoch("DSM", {}, 16000, 5)
    except Exception:
        dsm_fpe = pinn_fpe = dsm16_fpe = None

    def mfu(eps, fpe):
        if fpe is None:
            return None, None
        tf = eps * fpe / 1e12
        return tf, 100.0 * tf * 1e12 / V5E_BF16_PEAK

    dsm_tf, dsm_pct = mfu(dsm, dsm_fpe)
    pinn_tf, pinn_pct = mfu(pinn, pinn_fpe)
    d16_tf, d16_pct = mfu(dsm_16k, dsm16_fpe)

    baseline_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "benchmarks", "torch_train_baseline.json",
    )
    vs_pinn = vs_dsm = None
    if os.path.exists(baseline_path):
        with open(baseline_path) as f:
            baseline = json.load(f)
        vs_pinn = pinn / baseline["pinn_epochs_per_sec"]
        vs_dsm = dsm / baseline["dsm_epochs_per_sec"]

    print(
        json.dumps(
            {
                "metric": "pinn_train_epochs_per_sec",
                "value": pinn,
                "unit": "epochs/s",
                "vs_baseline": vs_pinn,
                "pinn_tflops": pinn_tf,
                "pinn_pct_peak": pinn_pct,
                "dsm_train_epochs_per_sec": dsm,
                "dsm_vs_baseline": vs_dsm,
                "dsm_tflops": dsm_tf,
                "dsm_pct_peak": dsm_pct,
                "dsm_batch16k_tflops": d16_tf,
                "dsm_batch16k_pct_peak": d16_pct,
                "dsm_fused_kernel_epochs_per_sec": dsm_fused,
                "dsm_fused_tflops": mfu(dsm_fused, dsm_fpe)[0]
                if dsm_fused else None,
                "peak_ref_tflops": V5E_BF16_PEAK / 1e12,
                "device": str(jax.devices()[0]),
                "workload": f"{TRAIN_EPOCHS} epochs x {TRAIN_BATCHES} "
                            f"batches x {TRAIN_BATCH}",
            }
        )
    )


def _measure_ensemble(loss_name: str, extra_cfg: dict, k: int) -> float:
    """Wall-clock seconds for TRAIN_EPOCHS epochs of a k-trial ensemble
    (one 3x3 lam/lam2 grid block when k=9) on the reference workload."""
    import itertools

    import optax

    from dmip_tpu import data, ensemble
    from dmip_tpu.problems import LinearForwardProblem

    prob = LinearForwardProblem()
    key = jax.random.PRNGKey(0)
    xs, ys = data.generate_dataset_linear(
        key, prob.xdim, prob.forward, TRAIN_BATCHES * TRAIN_BATCH
    )
    model, cfg = get_model_from_args(
        {"model": "CDE", "loss_fn": loss_name,
         "hidden_layers": [512, 512, 512], **extra_cfg},
        {"xdim": 2, "ydim": 2},
    )
    pairs = list(itertools.product([1e-4, 1e-3, 1e-2], [1e-3, 1e-2, 1e-1]))
    pairs = pairs[:k]
    lams = jnp.asarray([p[0] for p in pairs], jnp.float32)
    lam2s = jnp.asarray([p[1] for p in pairs], jnp.float32)

    optimizer = optax.adam(1e-4)
    epc = 20
    loss_kwargs = {}
    if loss_name != "DSM":
        loss_kwargs = {"initial_condition": prob.score_posterior}
    epoch_fn = ensemble.make_ensemble_epoch_fn(
        model, cfg, optimizer,
        lambda kk: data.linear_epoch_batches(kk, xs, ys, prob.noise_std,
                                             TRAIN_BATCH),
        epochs_per_call=epc,
        loss_kwargs=loss_kwargs,
        donate=False,
    )
    ens_params = ensemble.init_ensemble(model, key, len(pairs))
    opt_state = jax.vmap(optimizer.init)(ens_params)
    n_active = jnp.asarray(epc, jnp.int32)
    # two blocking warmups (compile + first post-init tunnel dispatch)
    out = epoch_fn(ens_params, opt_state, key, 0, lams, lam2s, n_active)
    jax.block_until_ready(out)
    out = epoch_fn(out[0], out[1], key, 0, lams, lam2s, n_active)
    jax.block_until_ready(out)

    t0 = time.time()
    p, o = out[0], out[1]
    for c in range(TRAIN_EPOCHS // epc):
        p, o, losses, _ = epoch_fn(p, o, key, (c + 1) * epc, lams, lam2s,
                                   n_active)
    jax.block_until_ready(losses)
    return time.time() - t0


def _pinned_probe_cpu() -> None:
    """(Runs in a CPU child on an 8-virtual-device mesh.)  COMPILER-level
    scaling verification for the device-PINNED trial backend
    (ensemble.make_pinned_ensemble_epoch_fn): this host has ONE physical
    core, so virtual-device wall-clock is meaningless — instead compile the
    8-device program and check the two facts that imply linear scaling on
    real chips: (1) the optimized HLO contains ZERO cross-device
    collectives (trials are embarrassingly parallel), and (2) total program
    FLOPs equal n_devices x the sequential single-trial program's (each
    device runs exactly the sequential jaxpr, no stacking overhead).
    Prints one JSON dict."""
    import optax

    from dmip_tpu import data, ensemble, train
    from dmip_tpu.parallel.mesh import get_mesh
    from dmip_tpu.problems import LinearForwardProblem

    n_dev = len(jax.devices())
    prob = LinearForwardProblem()
    key = jax.random.PRNGKey(0)
    batch, n_batches, epc = 256, 10, 5
    xs, ys = data.generate_dataset_linear(key, prob.xdim, prob.forward,
                                          n_batches * batch)
    model, cfg = get_model_from_args(
        {"model": "CDE", "loss_fn": "PINNLoss", "lam": 0.1, "lam2": 1.0,
         "hidden_layers": [64, 64]},
        {"xdim": 2, "ydim": 2},
    )
    batch_fn = lambda kk: data.linear_epoch_batches(kk, xs, ys,
                                                    prob.noise_std, batch)
    optimizer = optax.adam(1e-4)
    lk = {"initial_condition": prob.score_posterior}

    # sequential single-trial program (the unit of grid work)
    loss_fn = model.make_loss_fn(cfg, **lk)
    seq_fn = train.make_epoch_fn(loss_fn, optimizer, batch_fn,
                                 epochs_per_call=epc, donate=False)
    params = model.init(key)
    seq_c = jax.jit(seq_fn).lower(
        params, optimizer.init(params), key, 0, jnp.asarray(epc, jnp.int32)
    ).compile()
    seq_flops = seq_c.cost_analysis().get("flops", 0.0)

    # n_dev trials pinned one-per-device
    mesh = get_mesh(n_dev)
    pin_fn = ensemble.make_pinned_ensemble_epoch_fn(
        model, cfg, optimizer, batch_fn, mesh, epochs_per_call=epc,
        loss_kwargs=lk, donate=False,
    )
    lams = jnp.full((n_dev,), 0.1, jnp.float32)
    lam2s = jnp.ones((n_dev,), jnp.float32)
    ens = ensemble.init_ensemble(model, key, n_dev)
    pin_c = pin_fn.lower(
        ens, jax.vmap(optimizer.init)(ens), key, 0, lams, lam2s,
        jnp.asarray(epc, jnp.int32),
    ).compile()
    pin_flops = pin_c.cost_analysis().get("flops", 0.0)
    hlo = pin_c.as_text()
    collectives = sum(
        hlo.count(op) for op in
        ("all-reduce", "all-gather", "reduce-scatter", "collective-permute",
         "all-to-all")
    )
    print(json.dumps({
        "n_devices": n_dev,
        "collective_ops_in_hlo": collectives,
        "seq_trial_gflops": seq_flops / 1e9,
        # cost_analysis is PER-DEVICE under SPMD: ratio 1.0 means each
        # device runs exactly the sequential trial's FLOPs (no stacking)
        "pinned_per_device_gflops": pin_flops / 1e9,
        "per_device_flops_vs_seq": pin_flops / seq_flops
        if seq_flops else None,
    }))


def _measure_pinned_one_device(loss_name: str, extra_cfg: dict) -> float:
    """Wall-clock seconds for TRAIN_EPOCHS epochs of ONE pinned trial on a
    1-device mesh (the real chip): the pinned backend's per-device program
    is the sequential trial program, so this over t_single is the backend's
    per-device overhead factor — with the compile-time zero-collectives
    check (_pinned_probe_cpu), K-chip scaling is K / overhead."""
    import optax

    from dmip_tpu import data, ensemble
    from dmip_tpu.parallel.mesh import get_mesh
    from dmip_tpu.problems import LinearForwardProblem

    prob = LinearForwardProblem()
    key = jax.random.PRNGKey(0)
    xs, ys = data.generate_dataset_linear(
        key, prob.xdim, prob.forward, TRAIN_BATCHES * TRAIN_BATCH
    )
    model, cfg = get_model_from_args(
        {"model": "CDE", "loss_fn": loss_name,
         "hidden_layers": [512, 512, 512], **extra_cfg},
        {"xdim": 2, "ydim": 2},
    )
    optimizer = optax.adam(1e-4)
    epc = 20
    loss_kwargs = {}
    if loss_name != "DSM":
        loss_kwargs = {"initial_condition": prob.score_posterior}
    mesh = get_mesh(1)
    epoch_fn = ensemble.make_pinned_ensemble_epoch_fn(
        model, cfg, optimizer,
        lambda kk: data.linear_epoch_batches(kk, xs, ys, prob.noise_std,
                                             TRAIN_BATCH),
        mesh, epochs_per_call=epc, loss_kwargs=loss_kwargs, donate=False,
    )
    lams = jnp.asarray([extra_cfg.get("lam", 1.0)], jnp.float32)
    lam2s = jnp.asarray([extra_cfg.get("lam2", 1.0)], jnp.float32)
    ens = ensemble.init_ensemble(model, key, 1)
    opt_state = jax.vmap(optimizer.init)(ens)
    n_active = jnp.asarray(epc, jnp.int32)
    out = epoch_fn(ens, opt_state, key, 0, lams, lam2s, n_active)
    jax.block_until_ready(out)
    out = epoch_fn(out[0], out[1], key, 0, lams, lam2s, n_active)
    jax.block_until_ready(out)

    t0 = time.time()
    p, o = out[0], out[1]
    for c in range(TRAIN_EPOCHS // epc):
        p, o, losses, _ = epoch_fn(p, o, key, (c + 1) * epc, lams, lam2s,
                                   n_active)
    jax.block_until_ready(losses)
    return time.time() - t0


def _measure_pinned_projection(n_devices: int = 8):
    """Run _pinned_probe_cpu in a fresh CPU child with n_devices virtual
    devices (the TPU host has one chip; scaling is validated on the same
    virtual mesh the test suite uses).  Returns the probe dict or None."""
    import re
    import subprocess
    import sys as _sys

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    flags = re.sub(r"--xla_force_host_platform_device_count=\d+", "",
                   env.get("XLA_FLAGS", ""))
    env["XLA_FLAGS"] = (
        flags + f" --xla_force_host_platform_device_count={n_devices}"
    ).strip()
    repo = os.path.dirname(os.path.abspath(__file__))
    pypath = [repo] + [p for p in env.get("PYTHONPATH", "").split(os.pathsep)
                       if p]
    env["PYTHONPATH"] = os.pathsep.join(dict.fromkeys(pypath))
    proc = subprocess.run(
        [_sys.executable, "-c",
         "import jax; jax.config.update('jax_platforms', 'cpu'); "
         "import bench; bench._pinned_probe_cpu()"],
        env=env, cwd=repo, capture_output=True, text=True, timeout=600,
    )
    if proc.returncode != 0:
        _sys.stderr.write(proc.stderr)
        return None
    return json.loads(proc.stdout.strip().splitlines()[-1])


def bench_ensemble() -> None:
    """Trial-parallel (ensemble) grid-training throughput on ONE chip:
    K same-structure trials (the grid's 3x3 lam/lam2 block,
    dmip_tpu/ensemble.py) trained as ONE vmapped jitted program vs K
    sequential runs (the reference trains grids strictly sequentially,
    model_selection.py:16-64).  vs_baseline = K * t_single / t_ensemble.

    Measured crossover (BENCHMARKS.md): stacking pays only while a single
    trial leaves the chip idle — DSM (26% single-trial MFU) gains ~2x,
    PINN (56%) measures ~0.75x, so single-chip grids should ensemble DSM
    blocks and run PINN blocks sequentially; on a multi-chip mesh the
    device-PINNED backend (one trial per device, shard_map) scales any
    loss at K / per-device-overhead — overhead measured here on the real
    chip (~1.00), zero collectives verified at compile time."""
    k = 9
    t_dsm_ens = _measure_ensemble("DSM", {}, k)
    t_dsm_single = TRAIN_EPOCHS / _measure_train("DSM", {})
    t_pinn_ens = _measure_ensemble("PINNLoss", {"lam": 0.1, "lam2": 1.0}, k)
    t_pinn_single = TRAIN_EPOCHS / _measure_train(
        "PINNLoss", {"lam": 0.1, "lam2": 1.0}
    )
    # Device-pinned backend projection (this host has ONE chip):
    # per-device overhead measured on the real chip + compile-time
    # zero-collectives/flops check of the 8-device program (CPU child).
    # Projected K-chip speedup for PINN grids = K / overhead.
    t_pinn_pinned1 = _measure_pinned_one_device(
        "PINNLoss", {"lam": 0.1, "lam2": 1.0})
    pinned_overhead = t_pinn_pinned1 / t_pinn_single
    pinned = _measure_pinned_projection(8)
    print(
        json.dumps(
            {
                "metric": "ensemble_trials_speedup_dsm",
                "value": k * t_dsm_single / t_dsm_ens,
                "unit": "x (K * t_single / t_ensemble)",
                "vs_baseline": k * t_dsm_single / t_dsm_ens,
                "n_trials": k,
                "dsm_ensemble_seconds": t_dsm_ens,
                "dsm_single_trial_seconds": t_dsm_single,
                "pinn_speedup": k * t_pinn_single / t_pinn_ens,
                "pinn_ensemble_seconds": t_pinn_ens,
                "pinn_single_trial_seconds": t_pinn_single,
                "pinn_pinned_per_device_overhead": pinned_overhead,
                "pinn_pinned_8dev_projected_speedup":
                    8.0 / max(pinned_overhead, 1.0)
                    if pinned and pinned["collective_ops_in_hlo"] == 0
                    else None,
                "pinned_compile_check": pinned,
                "device": str(jax.devices()[0]),
                "workload": f"{k} trials x {TRAIN_EPOCHS} epochs x "
                            f"{TRAIN_BATCHES} batches x {TRAIN_BATCH}",
            }
        )
    )


def bench_dps() -> None:
    """Analytic-guidance DPS sampling throughput: the fused guided kernel
    (ops/dps_kernel.py — per step: prior fwd, 3 surrogate VJPs, 3 prior
    VHPs, all in VMEM) vs the XLA autodiff scan it replaces.  Weights are
    random at the flagship shapes (512x3 prior, the real frozen surrogate);
    throughput is shape-dependent only."""
    from dmip_tpu.models import AnalyticGuidanceDPS, PosteriorDiffusionEstimator
    from dmip_tpu.problems import scatterometry as scat

    fwd, fparams = scat.load_forward_model()
    base = PosteriorDiffusionEstimator(xdim=3, ydim=23,
                                       hidden_layers=(512, 512, 512))
    key = jax.random.PRNGKey(0)
    params = base.init(key)
    y = scat.noisy_forward(
        jax.random.PRNGKey(1), fwd,
        scat.sample_prior(jax.random.PRNGKey(2), 1, fparams["lambd_bd"]),
        fparams["a"], fparams["b"],
    )[0]

    def measure(method, surr):
        ag = AnalyticGuidanceDPS(base, fwd, fparams, guidance_clip=10.0,
                                 surrogate_weights=surr)
        sampler = jax.jit(
            lambda k: ag.sample(params, k, y, N_SAMPLES, N_STEPS,
                                method=method)
        )
        # two blocking warmups (first post-init dispatch costs 100ms+)
        jax.block_until_ready(sampler(key))
        jax.block_until_ready(sampler(jax.random.fold_in(key, 999)))
        t0 = time.time()
        for r in range(N_REPS):
            out = sampler(jax.random.fold_in(key, r))
        jax.block_until_ready(out)
        return N_REPS * N_SAMPLES * N_STEPS / (time.time() - t0)

    xla = measure("xla", None)
    fused = None
    if jax.default_backend() == "tpu":
        fused = measure("pallas", scat.load_surrogate_weights())
    print(
        json.dumps(
            {
                "metric": "dps_guided_sample_steps_per_sec",
                "value": fused if fused is not None else xla,
                "unit": "sample_steps/s",
                "vs_baseline": (fused / xla) if fused else None,
                "xla_sample_steps_per_sec": xla,
                "device": str(jax.devices()[0]),
                "workload": f"{N_REPS} reps x {N_SAMPLES} x {N_STEPS} steps",
            }
        )
    )


def bench_refined() -> None:
    """Flagship energy-refined sampler throughput (scatterometry): fused
    Pallas E-M proposal (200 steps) + exact-energy XLA MH refinement
    (20 steps on the surrogate posterior).  Measured round 3: the MH stage
    adds ~1.4 ms to a ~50 ms call (<3%); a fused-Pallas MH refinement
    stage was measured SLOWER at this step count (4.9 ms — kernel staging
    dominates 20 steps; XLA inlines the short scan better), so the scan
    path is the product path."""
    from dmip_tpu.checkpoints import load_pytree
    from dmip_tpu.models.refined import EnergyRefinedModel
    from dmip_tpu.problems import scatterometry as scat

    fwd, fparams = scat.load_forward_model()
    model, _ = get_model_from_args(
        {"model": "CDE", "loss_fn": "DSM", "hidden_layers": [512, 512, 512]},
        {"xdim": 3, "ydim": 23},
    )
    key = jax.random.PRNGKey(0)
    params = model.init(key)
    ckpt = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "benchmarks", "checkpoints", "cde_500k")
    if os.path.exists(os.path.join(ckpt, "params.npz")):
        params = load_pytree(ckpt, params, "params")
    energy = lambda x, yt: scat.get_log_posterior(
        x, fwd, fparams["a"], fparams["b"], yt, fparams["lambd_bd"]
    )
    refined = EnergyRefinedModel(model, energy, refine_steps=20,
                                 kernel="mh", noise_std=0.2)
    y = scat.noisy_forward(
        jax.random.PRNGKey(1), fwd,
        scat.sample_prior(jax.random.PRNGKey(2), 1, fparams["lambd_bd"]),
        fparams["a"], fparams["b"],
    )[0]

    def measure(m):
        sampler = jax.jit(lambda k: m.sample(params, k, y, N_SAMPLES, N_STEPS))
        # two blocking warmup calls: the first post-init dispatch through the
        # TPU tunnel can cost 100ms+ extra and pollutes a 5-rep average
        jax.block_until_ready(sampler(key))
        jax.block_until_ready(sampler(jax.random.fold_in(key, 999)))
        t0 = time.time()
        for r in range(N_REPS):
            out = sampler(jax.random.fold_in(key, r))
        jax.block_until_ready(out)
        return N_REPS * N_SAMPLES / (time.time() - t0)

    plain = measure(model)
    ref = measure(refined)
    print(
        json.dumps(
            {
                "metric": "refined_posterior_samples_per_sec",
                "value": ref,
                "unit": "samples/s",
                "vs_baseline": ref / plain,  # refinement overhead factor
                "plain_samples_per_sec": plain,
                "device": str(jax.devices()[0]),
                "workload": f"{N_REPS} reps x {N_SAMPLES} samples x "
                            f"({N_STEPS} E-M + 20 MH) steps",
            }
        )
    )


def bench_mh() -> None:
    """Fused Metropolis ground-truth kernel throughput (ops/mh_kernel.py):
    one GT unit = 30k chains x 1000 steps on the surrogate posterior
    (generate_scatterometry_ground_truth.py's workload; the reference fans
    this out over 4 joblib CPU processes)."""
    from dmip_tpu.ops import fused_mh_scatterometry
    from dmip_tpu.problems import scatterometry as scat

    fwd, fparams = scat.load_forward_model()
    weights = scat.load_surrogate_weights()
    key = jax.random.PRNGKey(0)
    y = scat.noisy_forward(
        jax.random.PRNGKey(1), fwd,
        scat.sample_prior(jax.random.PRNGKey(2), 1, fparams["lambd_bd"]),
        fparams["a"], fparams["b"],
    )[0]
    n, steps = 30_000, 1000

    def run(k):
        k0, ks = jax.random.split(k)
        x0 = jax.random.uniform(k0, (n, 3)) * 2.0 - 1.0
        seed = jax.random.randint(ks, (1,), 0, jnp.iinfo(jnp.int32).max)
        return fused_mh_scatterometry(
            weights, x0, y, steps, noise_std=0.5,
            a=fparams["a"], b=fparams["b"], lambd_bd=fparams["lambd_bd"],
            seed=seed,
        )

    sampler = jax.jit(run)
    jax.block_until_ready(sampler(key))
    jax.block_until_ready(sampler(jax.random.fold_in(key, 999)))
    t0 = time.time()
    for r in range(N_REPS):
        out = sampler(jax.random.fold_in(key, r))
    jax.block_until_ready(out)
    dt = (time.time() - t0) / N_REPS
    print(
        json.dumps(
            {
                "metric": "mh_gt_chain_steps_per_sec",
                "value": n * steps / dt,
                "unit": "chain_steps/s",
                "vs_baseline": None,
                "seconds_per_gt_unit": dt,
                "full_gt_estimate_min": dt * 100 * 10 / 60,
                "device": str(jax.devices()[0]),
                "workload": f"{n} chains x {steps} MH steps (surrogate energy)",
            }
        )
    )


def main() -> None:
    model, _ = get_model_from_args(
        {"model": "CDE", "loss_fn": "DSM", "hidden_layers": [512, 512, 512]},
        {"xdim": 2, "ydim": 2},
    )
    key = jax.random.PRNGKey(0)
    params = model.init(key)
    ys = jax.random.normal(jax.random.PRNGKey(1), (N_YS, 2))

    # One condition's samples per call (the reference's unit of work),
    # N_YS conditions per rep; the fused Pallas kernel is the default TPU
    # path inside model.sample.
    sampler = jax.jit(
        lambda k, y: model.sample(params, k, y, N_SAMPLES, N_STEPS)
    )

    # warmup / compile — two blocking calls: the first post-init dispatch
    # through the TPU tunnel costs 100ms+ extra (see bench_refined)
    jax.block_until_ready(sampler(key, ys[0]))
    jax.block_until_ready(sampler(jax.random.fold_in(key, 999), ys[0]))

    t0 = time.time()
    for r in range(N_REPS):
        for i in range(N_YS):
            out = sampler(jax.random.fold_in(key, r * N_YS + i), ys[i])
    jax.block_until_ready(out)
    elapsed = time.time() - t0

    total_sample_steps = N_REPS * N_YS * N_SAMPLES * N_STEPS
    value = total_sample_steps / elapsed

    baseline_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "benchmarks", "torch_baseline.json",
    )
    vs_baseline = None
    if os.path.exists(baseline_path):
        with open(baseline_path) as f:
            baseline = json.load(f)
        vs_baseline = value / baseline["value"]

    print(
        json.dumps(
            {
                "metric": "em_sample_steps_per_sec",
                "value": value,
                "unit": "sample_steps/s",
                "vs_baseline": vs_baseline,
                "device": str(jax.devices()[0]),
                "workload": f"{N_REPS}x{N_YS}ys x {N_SAMPLES} x {N_STEPS} steps",
                "elapsed_s": elapsed,
            }
        )
    )


def bench_expint() -> None:
    """NFE-efficiency wall-clock: the exponential integrator
    (samplers.exponential_integrator, DPM-Solver family; XLA scan path) vs
    the fused 200-step E-M Pallas kernel, per 30k-sample posterior at the
    flagship shapes.  Answers the round-4 verdict's open question: does 6x
    fewer net evaluations beat the ~50 ms fused kernel in wall-clock?
    (Accuracy at the full protocol: BENCHMARKS.md NFE-efficiency table /
    tools/expint_eval.py.)"""
    model, _ = get_model_from_args(
        {"model": "CDE", "loss_fn": "DSM", "hidden_layers": [512, 512, 512]},
        {"xdim": 2, "ydim": 2},
    )
    key = jax.random.PRNGKey(0)
    params = model.init(key)
    y = jax.random.normal(jax.random.PRNGKey(1), (2,))

    def measure(method, steps):
        sampler = jax.jit(
            lambda k: model.sample(params, k, y, N_SAMPLES, steps,
                                   method=method)
        )
        jax.block_until_ready(sampler(key))
        jax.block_until_ready(sampler(jax.random.fold_in(key, 999)))
        t0 = time.time()
        for r in range(N_REPS * N_YS):
            out = sampler(jax.random.fold_in(key, r))
        jax.block_until_ready(out)
        return (time.time() - t0) / (N_REPS * N_YS)

    t_em = measure("auto", N_STEPS)
    t_e32 = measure("expint:sde:1", 32)
    t_e16 = measure("expint:sde:1", 16)
    print(
        json.dumps(
            {
                "metric": "expint32_posteriors_per_sec",
                "value": 1.0 / t_e32,
                "unit": "posteriors/s (30k samples each)",
                "vs_baseline": t_em / t_e32,
                "em200_fused_seconds_per_posterior": t_em,
                "expint32_seconds_per_posterior": t_e32,
                "expint16_seconds_per_posterior": t_e16,
                "expint32_nfe": 33,
                "em200_nfe": 200,
                "device": str(jax.devices()[0]),
                "workload": f"{N_REPS * N_YS} reps x {N_SAMPLES} samples",
            }
        )
    )


if __name__ == "__main__":
    if "--train" in sys.argv[1:]:
        bench_train()
    elif "--dps" in sys.argv[1:]:
        bench_dps()
    elif "--refined" in sys.argv[1:]:
        bench_refined()
    elif "--mh" in sys.argv[1:]:
        bench_mh()
    elif "--ensemble" in sys.argv[1:]:
        bench_ensemble()
    elif "--expint" in sys.argv[1:]:
        bench_expint()
    elif "--main-only" in sys.argv[1:]:
        main()
    else:
        # Default (driver-captured) invocation: line 1 is the headline E-M
        # metric the driver parses; the remaining labeled JSON lines give
        # the full throughput picture (round-4 verdict #8).  Each extra
        # mode is best-effort — a failure must not invalidate line 1.
        main()
        for fn in (bench_train, bench_refined, bench_mh, bench_dps,
                   bench_ensemble, bench_expint):
            try:
                fn()
            except Exception as e:  # pragma: no cover - device-dependent
                print(json.dumps({
                    "metric": fn.__name__, "error": f"{type(e).__name__}: {e}"
                }), flush=True)
