"""Linear-problem diffusion experiment driver.

TPU-native equivalent of reference ``main_diffusion_linear.py``: load config,
generate the dataset, build the (model, loss) pair from config strings, train
with jitted multi-epoch scans, checkpoint, and evaluate against the analytic
posterior (KL / NLPD / score-MSE into results.csv).

Usage: python mains/main_diffusion_linear.py [--config configs/config_linear.yml]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from dmip_tpu import checkpoints, data, evaluate, train
from dmip_tpu.problems import LinearForwardProblem
from dmip_tpu.utils import MetricsWriter, load_config, set_directories


def run(config: dict) -> tuple:
    prob = LinearForwardProblem()
    key = jax.random.PRNGKey(int(config.get("random_state", 7)))
    k_data, k_split, k_init, k_train, k_eval = jax.random.split(key, 5)

    xs, ys = data.generate_dataset_linear(
        k_data, prob.xdim, prob.forward, int(config["dataset_size"])
    )
    x_train, x_test, y_train, y_test = data.train_test_split(
        k_split, xs, ys, float(config["train_size"])
    )

    model, loss_cfg = train.get_model_from_args(
        config, {"xdim": prob.xdim, "ydim": prob.ydim}
    )
    loss_fn = model.make_loss_fn(loss_cfg, initial_condition=prob.score_posterior)
    params = model.init(k_init)

    resume = bool(config.get("resume_training", False))
    ckpt_dir = os.path.join(config["train_dir"], "checkpoint")
    optimizer = train.build_optimizer(float(config["lr"]), config.get("grad_clip"))
    opt_state, start_epoch = None, 0
    if resume and os.path.exists(os.path.join(ckpt_dir, "manifest.json")):
        restored = checkpoints.load_checkpoint(
            ckpt_dir, params, optimizer.init(params)
        )
        params = restored["params"]
        opt_state = restored.get("opt_state")
        start_epoch = restored["step"]
        if "key" in restored:
            k_train = restored["key"]
        print(f"resumed from epoch {start_epoch}")

    log_dir = set_directories(config["train_dir"], config["out_dir"], resume)
    epc = int(config.get("epochs_per_call", 25))
    # train_backend: 'xla' (default; data-parallel over all visible
    # devices) or 'fused_pallas' (DSM-only whole-epochs-on-chip kernel)
    epoch_fn = train.select_epoch_fn(
        config,
        model,
        loss_fn,
        optimizer,
        lambda k: data.linear_epoch_batches(
            k, x_train, y_train, prob.noise_std, int(config["batch_size"])
        ),
        epochs_per_call=epc,
    )
    with MetricsWriter(log_dir) as logger:
        params, opt_state, _ = train.fit(
            epoch_fn, params, optimizer, k_train,
            num_epochs=int(config["n_epochs"]), epochs_per_call=epc,
            logger=logger, desc="diffusion-linear", opt_state=opt_state,
            start_epoch=start_epoch,
        )
    checkpoints.save_checkpoint(
        ckpt_dir, params, opt_state=opt_state,
        step=int(config["n_epochs"]), key=k_train,
    )

    # eval_method/eval_num_steps: evaluation-protocol sampler ('auto' =
    # 200-step E-M; 'expint[:ode|:sde][:1|:2]' + eval_num_steps ~32 = the
    # exponential integrator at ~6x fewer net evaluations — see
    # tools/expint_eval.py for the measured-parity table).
    eval_method = str(config.get("eval_method", "auto"))
    eval_steps = int(config.get("eval_num_steps", 200))
    metrics = evaluate.evaluate_linear(
        model, params, prob,
        y_test[: int(config["n_samples_y"])], k_eval,
        out_dir=config["out_dir"], plot_ys=config.get("plot_ys", ()),
        n_samples_x=int(config["n_samples_x"]),
        n_repeats=int(config.get("n_repeats", 10)),
        num_steps=eval_steps, method=eval_method,
    )

    if config.get("refine"):  # (CLI --refine overrides the config key)
        # Energy-refined companion row: the linear problem has an EXACT
        # analytic energy (problems/linear.py log_posterior, re-derived from
        # reference linear_problem.py:48-58), so the same exact-energy
        # refinement that closes the scatterometry SNF gap applies here —
        # the flagship abstraction is problem-agnostic (round-3 verdict #6).
        from dmip_tpu.models.refined import from_config

        energy = lambda x, ys: prob.log_posterior(x, ys)[:, 0]
        refined, tag = from_config(model, energy, str(config["refine"]))
        r_metrics = evaluate.evaluate_linear(
            refined, params, prob,
            y_test[: int(config["n_samples_y"])], k_eval,
            out_dir=config["out_dir"] + f"_refined_{tag}",
            n_samples_x=int(config["n_samples_x"]),
            n_repeats=int(config.get("n_repeats", 10)),
            num_steps=eval_steps, method=eval_method,
        )
        print(f"refined[{tag}]: KL={r_metrics[0]:.4f} NLPD={r_metrics[1]:.4f} "
              f"score-MSE={r_metrics[2]:.4f}", flush=True)

    return params, metrics


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--config", default="configs/config_linear.yml")
    p.add_argument("--refine", default=None,
                   help="override the config's refine spec (models/refined "
                        "grammar, e.g. mala,60,0.05); out_dir suffix "
                        "carries the tag")
    args = p.parse_args()
    config = load_config(args.config)
    if args.refine is not None:
        config["refine"] = args.refine
    _, (kl, nlpd, mse) = run(config)
    print(f"final: KL={kl:.4f} NLPD={nlpd:.4f} score-MSE={mse:.4f}")
