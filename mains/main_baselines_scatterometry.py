"""Baselines driver, scatterometry: SNF vs diffusion(DSM) vs INN vs MCMC GT.

TPU-native equivalent of reference ``main_baselines_scatterometry.py``:
trains the three models (fresh surrogate simulation per epoch) and evaluates
against precomputed MCMC ground truth with forward + reverse histogram KLs,
per-model NLLs under the MCMC energy, and diffusion score-MSE.

Usage: python mains/main_baselines_scatterometry.py \
          [--config configs/config_baselines_scatterometry.yml] [--gt_dir ...]
"""

from __future__ import annotations

import argparse
import csv
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
import optax

from dmip_tpu import checkpoints, data, flows, train
from dmip_tpu.evaluate import histogramdd_flat, kl_pair, sliced_w2
from dmip_tpu.problems import scatterometry as scat
from dmip_tpu.utils import MetricsWriter, load_config, set_directories


def run(config, gt_dir, eval_only: bool = False):
    forward_model, fparams = scat.load_forward_model()
    a, b, lambd_bd = fparams["a"], fparams["b"], fparams["lambd_bd"]
    xdim, ydim = fparams["xdim"], fparams["ydim"]
    key = jax.random.PRNGKey(int(config.get("RANDOM_STATE", 13)))
    k_data, k_train, k_eval = jax.random.split(key, 3)

    _, y_test = data.generate_dataset_scatterometry(
        k_data, forward_model, a, b, size=int(config["n_samples_y"])
    )
    score_post = scat.score_posterior(forward_model, a, b, lambd_bd)
    neg_log_post = lambda x, ys: scat.get_log_posterior(
        x, forward_model, a, b, ys, lambd_bd
    )

    snf = flows.create_snf(
        int(config["num_layers_INN"]), int(config["size_hidden_layers_INN"]),
        neg_log_post,
        metr_steps_per_block=int(config["metr_steps_per_block"]),
        dimension=xdim, dimension_condition=ydim,
        noise_std=float(config["noise_std"]),
    )
    diffusion, loss_cfg = train.get_model_from_args(
        {**config, "loss_fn": "DSM"}, fparams
    )
    inn = flows.create_inn(
        int(config["num_layers_INN"]), int(config["size_hidden_layers_INN"]),
        dimension=xdim, dimension_condition=ydim,
    )

    bs = int(config["batch_size"])
    batch_fn = lambda k: data.scatterometry_epoch_batches(
        k, forward_model, a, b, lambd_bd, bs
    )
    k_snf, k_dsm, k_inn = jax.random.split(k_train, 3)

    if eval_only:
        # Re-score existing checkpoints (e.g. after adding a metric) without
        # paying the three training runs.  Deliberately no set_directories
        # here: that would wipe the previous results AND the training run's
        # logs before we even know the checkpoints load (_evaluate creates
        # out_dir itself and overwrites results.csv).
        snf_params, d_params, inn_params = (
            checkpoints.load_checkpoint(
                os.path.join(config["train_dir"], name), m.init(k), None
            )["params"]
            for name, m, k in (
                ("snf", snf, k_snf), ("diffusion", diffusion, k_dsm),
                ("INN", inn, k_inn),
            )
        )
        return _evaluate(config, gt_dir, forward_model, fparams, y_test,
                         score_post, neg_log_post, snf, diffusion, inn,
                         snf_params, d_params, inn_params, k_eval)

    log_dir = set_directories(config["train_dir"], config["out_dir"])
    logger = MetricsWriter(log_dir)

    snf_params = snf.init(k_snf)
    opt = optax.adam(float(config["lr"]))
    snf_loss = lambda p, k, x, y: (flows.snf_ml_loss(snf, p, k, x, y), {})
    epoch_fn = train.make_epoch_fn(snf_loss, opt, batch_fn, epochs_per_call=5)
    snf_params, _, _ = train.fit(
        epoch_fn, snf_params, opt, k_snf,
        num_epochs=int(config["n_epochs_SNF"]), epochs_per_call=5,
        logger=logger, desc="snf",
    )

    d_params = diffusion.init(k_dsm)
    opt_d = optax.adam(float(config["lr"]))
    epoch_fn = train.make_epoch_fn(
        diffusion.make_loss_fn(loss_cfg), opt_d, batch_fn, epochs_per_call=100
    )
    d_params, _, _ = train.fit(
        epoch_fn, d_params, opt_d, k_dsm,
        num_epochs=int(config["n_epochs_dsm"]), epochs_per_call=100,
        logger=logger, desc="diffusion",
    )

    inn_params = inn.init(k_inn)
    opt_i = optax.adam(float(config["lr_INN"]))
    inn_loss = lambda p, k, x, y: (flows.inn_ml_loss(inn, p, x, y), {})
    epoch_fn = train.make_epoch_fn(inn_loss, opt_i, batch_fn, epochs_per_call=25)
    inn_params, _, _ = train.fit(
        epoch_fn, inn_params, opt_i, k_inn,
        num_epochs=int(config["n_epochs_INN"]), epochs_per_call=25,
        logger=logger, desc="inn",
    )
    logger.close()

    for name, p in (("snf", snf_params), ("diffusion", d_params), ("INN", inn_params)):
        checkpoints.save_checkpoint(os.path.join(config["train_dir"], name), p)

    return _evaluate(config, gt_dir, forward_model, fparams, y_test,
                     score_post, neg_log_post, snf, diffusion, inn,
                     snf_params, d_params, inn_params, k_eval)


def _evaluate(config, gt_dir, forward_model, fparams, y_test, score_post,
              neg_log_post, snf, diffusion, inn, snf_params, d_params,
              inn_params, k_eval):
    xdim, ydim = fparams["xdim"], fparams["ydim"]
    n_x = int(config["n_samples_x"])
    n_repeats = int(config.get("n_repeats", 10))
    nbins, xlim = 75, (-1.2, 1.2)
    base = diffusion.sde.base

    @jax.jit
    def eval_y_repeat(key, y, x_true):
        k2, k3, k4, kw = jax.random.split(key, 4)
        ys_t = jnp.broadcast_to(y, (n_x, ydim))
        energy = lambda x: neg_log_post(x, ys_t)
        x_diff = diffusion.sample(d_params, k2, y, n_x, 200)
        x_snf = snf.sample(snf_params, k3, y, n_x)
        x_inn = inn.sample(inn_params, k4, y, n_x)

        t0 = jnp.zeros((n_x, 1))
        score_pred = diffusion.apply_a(d_params, x_true, ys_t, t0) / base.g(t0)
        mse = jnp.mean(jnp.sum((score_pred - score_post(x_true, ys_t)) ** 2, 1))
        hists = [
            histogramdd_flat(s, nbins, *xlim)
            for s in (x_true, x_snf, x_diff, x_inn)
        ]
        nlls = [jnp.sum(energy(s)) / n_x for s in (x_true, x_snf, x_diff, x_inn)]
        n_w2 = min(n_x, x_true.shape[0])
        w2s = [
            sliced_w2(kw, s[:n_w2], x_true[:n_w2])
            for s in (x_snf, x_diff, x_inn)
        ]
        return hists, nlls, mse, w2s, (x_snf, x_diff, x_inn)

    rows = []
    out_dir = config["out_dir"]
    os.makedirs(out_dir, exist_ok=True)
    for i in range(y_test.shape[0]):
        hist_sums = [jnp.zeros(nbins**3, jnp.float32) for _ in range(4)]
        nll_sums = [0.0] * 4
        w2_sums = [0.0] * 3
        mse_sum = 0.0
        last = None
        for j in range(n_repeats):
            k_eval, k = jax.random.split(k_eval)
            x_true = jnp.asarray(
                np.load(os.path.join(gt_dir, str(i), f"{j}.npy")), jnp.float32
            )
            hists, nlls, mse, w2s, preds = eval_y_repeat(k, y_test[i], x_true)
            hist_sums = [hs + h for hs, h in zip(hist_sums, hists)]
            nll_sums = [s + float(v) / n_repeats for s, v in zip(nll_sums, nlls)]
            w2_sums = [s + float(v) / n_repeats for s, v in zip(w2_sums, w2s)]
            mse_sum += float(mse) / n_repeats
            last = (x_true, *preds)
        kls = [kl_pair(hist_sums[0], hist_sums[m]) for m in (1, 2, 3)]
        rows.append({
            "KL_SNF": float(kls[0][0]), "KL_SNF_reverse": float(kls[0][1]),
            "KL_diffusion": float(kls[1][0]),
            "KL_diffusion_reverse": float(kls[1][1]),
            "KL_INN": float(kls[2][0]), "KL_INN_reverse": float(kls[2][1]),
            "NLL_mcmc": nll_sums[0], "NLL_snf": nll_sums[1],
            "NLL_diffusion": nll_sums[2], "NLL_inn": nll_sums[3],
            "MSE": mse_sum,
            "W2_SNF": w2_sums[0], "W2_diffusion": w2_sums[1],
            "W2_INN": w2_sums[2],
        })
        if i in config.get("plot_ys", ()):
            from dmip_tpu.utils.plotting import plot_density

            for tag, arr in zip(("true", "snf", "diffusion", "inn"), last):
                plot_density(
                    np.asarray(arr), nbins, limits=xlim, xticks=[-1, 0, 1],
                    size=(12, 12), labelsize=30,
                    fname=os.path.join(out_dir, f"posterior-{tag}-{i}.svg"),
                )
        print(
            f"y {i + 1}/{y_test.shape[0]} KL_SNF={rows[-1]['KL_SNF']:.3f} "
            f"KL_diffusion={rows[-1]['KL_diffusion']:.3f} "
            f"KL_INN={rows[-1]['KL_INN']:.3f}",
            flush=True,
        )

    with open(os.path.join(out_dir, "results.csv"), "w", newline="") as f:
        w = csv.DictWriter(f, [""] + list(rows[0].keys()))
        w.writeheader()
        for i, r in enumerate(rows):
            w.writerow({"": i, **r})
    mean = {k: float(np.mean([r[k] for r in rows])) for k in rows[0]}
    for m in ("KL_SNF", "KL_diffusion", "KL_INN",
              "W2_SNF", "W2_diffusion", "W2_INN"):
        print(f"{m}: {mean[m]}")
    return mean


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--config", default="configs/config_baselines_scatterometry.yml")
    p.add_argument("--gt_dir", default="data/gt_samples_scatterometry")
    p.add_argument("--eval_only", action="store_true",
                   help="re-score existing checkpoints in train_dir "
                        "(skip the three training runs)")
    args = p.parse_args()
    run(load_config(args.config), args.gt_dir, eval_only=args.eval_only)
