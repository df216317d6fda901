"""Scatterometry diffusion experiment driver.

TPU-native equivalent of reference ``main_diffusion_scatterometry.py``:
online per-epoch simulation through the frozen surrogate folds into the
jitted multi-epoch train scan; evaluation compares against precomputed MCMC
ground truth (mains/generate_scatterometry_ground_truth.py).

Usage: python mains/main_diffusion_scatterometry.py \
          [--config configs/config_scatterometry.yml] [--gt_dir data/gt...]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from dmip_tpu import checkpoints, data, evaluate, train
from dmip_tpu.problems import scatterometry as scat
from dmip_tpu.utils import MetricsWriter, load_config, set_directories


def run(config: dict, gt_dir: str) -> tuple:
    forward_model, fparams = scat.load_forward_model()
    key = jax.random.PRNGKey(int(config.get("RANDOM_STATE", 13)))
    k_data, k_init, k_train, k_eval = jax.random.split(key, 4)

    _, y_test = data.generate_dataset_scatterometry(
        k_data, forward_model, fparams["a"], fparams["b"],
        size=int(config["n_samples_y"]),
    )
    score_post = scat.score_posterior(
        forward_model, fparams["a"], fparams["b"], fparams["lambd_bd"]
    )

    model, loss_cfg = train.get_model_from_args(config, fparams)
    loss_fn = model.make_loss_fn(
        loss_cfg, initial_condition=score_post,
        forward_model=forward_model, forward_params=fparams,
    )
    params = model.init(k_init)

    resume = bool(config.get("resume_training", False))
    ckpt_dir = os.path.join(config["train_dir"], "checkpoint")
    optimizer = train.build_optimizer(
        float(config.get("lr", 1e-4)), config.get("grad_clip"),
        schedule=config.get("lr_schedule"),
        decay_steps=int(config["n_epochs"])
        * data.SCATTEROMETRY_BATCHES_PER_EPOCH,
        lr_min_ratio=float(config.get("lr_min_ratio", 0.01)),
    )
    opt_state, start_epoch = None, 0
    if resume and os.path.exists(os.path.join(ckpt_dir, "manifest.json")):
        restored = checkpoints.load_checkpoint(
            ckpt_dir, params, optimizer.init(params)
        )
        params = restored["params"]
        opt_state = restored.get("opt_state")
        start_epoch = restored["step"]
        print(f"resumed from epoch {start_epoch}")

    log_dir = set_directories(config["train_dir"], config["out_dir"], resume)
    epc = int(config.get("epochs_per_call", 100))
    # train_backend: 'xla' (default; data-parallel over all visible
    # devices) or 'fused_pallas' (DSM-only whole-epochs-on-chip kernel)
    epoch_fn = train.select_epoch_fn(
        config,
        model,
        loss_fn,
        optimizer,
        lambda k: data.scatterometry_epoch_batches(
            k, forward_model, fparams["a"], fparams["b"], fparams["lambd_bd"],
            int(config["batch_size"]),
        ),
        epochs_per_call=epc,
    )
    with MetricsWriter(log_dir) as logger:
        params, opt_state, _ = train.fit(
            epoch_fn, params, optimizer, k_train,
            num_epochs=int(config["n_epochs"]), epochs_per_call=epc,
            logger=logger, desc="diffusion-scat", opt_state=opt_state,
            start_epoch=start_epoch,
        )
    checkpoints.save_checkpoint(
        ckpt_dir, params, opt_state=opt_state,
        step=int(config["n_epochs"]), key=k_train,
    )

    gt_loader = data.gt_loader(gt_dir)
    # eval_method/eval_num_steps: sampler used by the evaluation protocol —
    # 'auto' is the fused 200-step E-M kernel; 'expint[:ode|:sde][:1|:2]'
    # with eval_num_steps ~32 runs the exponential integrator at ~6x fewer
    # net evaluations (samplers.exponential_integrator; measured-parity
    # table in BENCHMARKS.md / tools/expint_eval.py).
    eval_method = str(config.get("eval_method", "auto"))
    eval_steps = int(config.get("eval_num_steps", 200))
    metrics = evaluate.evaluate_scatterometry(
        model, params, forward_model, fparams, score_post,
        y_test, gt_loader, k_eval,
        out_dir=config["out_dir"], plot_ys=config.get("plot_ys", ()),
        n_samples_x=int(config["n_samples_x"]),
        n_repeats=int(config.get("n_repeats", 10)),
        num_steps=eval_steps, method=eval_method,
    )

    refine_cfg = config.get("refine")
    if refine_cfg:
        # Energy-refined sampling (models/refined.py): the trained reverse-SDE
        # sampler proposes, a short exact-energy MCMC chain on the surrogate
        # posterior refines — the same sampling-time information the
        # reference's SNF consumes in its stochastic layers (models/SNF.py:
        # 250-275).  The round-3 flagship recipe
        # (configs/config_scatterometry_refined.yml) ties SNF on histogram KL
        # and wins NLPD and sliced-W2 (BENCHMARKS.md).
        from dmip_tpu.models import EnergyRefinedModel
        from dmip_tpu.models.refined import from_config

        energy = lambda x, yt: scat.get_log_posterior(
            x, forward_model, fparams["a"], fparams["b"], yt,
            fparams["lambd_bd"],
        )
        if isinstance(refine_cfg, str):
            # string grammar (models/refined.from_config) — supports the
            # round-4 annealed/tempered options, e.g. 'mh,20,0.2,anneal=0.5'
            refined, _tag = from_config(model, energy, refine_cfg)
        else:
            refined = EnergyRefinedModel(
                model, energy,
                refine_steps=int(refine_cfg.get("steps", 5)),
                kernel=str(refine_cfg.get("kernel", "mh")),
                noise_std=float(refine_cfg.get("noise_std", 0.4)),
                stepsize=float(refine_cfg.get("stepsize", 5e-3)),
                lang_steps=int(refine_cfg.get("lang_steps", 1)),
                anneal_from=float(refine_cfg.get("anneal_from", 1.0)),
                anneal_to=float(refine_cfg.get("anneal_to", 1.0)),
            )
        r_out = config["out_dir"] + "_refined"
        os.makedirs(r_out, exist_ok=True)
        r_metrics = evaluate.evaluate_scatterometry(
            refined, params, forward_model, fparams, score_post,
            y_test, gt_loader, k_eval,
            out_dir=r_out, plot_ys=(),
            n_samples_x=int(config["n_samples_x"]),
            n_repeats=int(config.get("n_repeats", 10)),
            num_steps=eval_steps, method=eval_method,
        )
        print(
            f"energy-refined ({refined.kernel}{refined.refine_steps}): "
            f"KL={r_metrics[0]:.4f} NLPD={r_metrics[1]:.4f} "
            f"score-MSE={r_metrics[2]:.4f}"
        )

    if config.get("eval_analytic_guidance") and config.get("model") == "Posterior":
        # Re-evaluate the same trained prior net under ANALYTIC likelihood
        # guidance (Chung & Kim's DPS proper; models.AnalyticGuidanceDPS):
        # the learned likelihood net is replaced by the exact
        # grad log p(y | x_hat_0) at sampling time.
        from dmip_tpu.models import AnalyticGuidanceDPS

        ag = AnalyticGuidanceDPS(
            model, forward_model, fparams,
            guidance_clip=float(config.get("guidance_clip", 100.0)),
            surrogate_weights=scat.load_surrogate_weights(),
        )
        ag_out = config["out_dir"] + "_analytic"
        os.makedirs(ag_out, exist_ok=True)
        ag_metrics = evaluate.evaluate_scatterometry(
            ag, params, forward_model, fparams, score_post,
            y_test, gt_loader, k_eval,
            out_dir=ag_out, plot_ys=(),
            n_samples_x=int(config["n_samples_x"]),
            n_repeats=int(config.get("n_repeats", 10)),
        )
        print(
            f"analytic-guidance DPS: KL={ag_metrics[0]:.4f} "
            f"NLPD={ag_metrics[1]:.4f} score-MSE={ag_metrics[2]:.4f}"
        )
    return params, metrics


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--config", default="configs/config_scatterometry.yml")
    p.add_argument("--gt_dir", default="data/gt_samples_scatterometry")
    args = p.parse_args()
    _, (kl, nlpd, mse) = run(load_config(args.config), args.gt_dir)
    print(f"final: KL={kl:.4f} NLPD={nlpd:.4f} score-MSE={mse:.4f}")
