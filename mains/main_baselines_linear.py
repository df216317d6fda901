"""Baselines driver, linear problem: SNF vs diffusion(DSM) vs INN.

TPU-native equivalent of reference ``main_baselines_linear.py``: trains the
three models on the same data and evaluates them side-by-side against the
analytic posterior (KL1/KL2/KL3, per-model NLLs, diffusion score-MSE into
one results.csv).

Usage: python mains/main_baselines_linear.py [--config configs/config_baselines_linear.yml]
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
from dmip_tpu.evaluate import histogramdd_flat, kl_pair
from dmip_tpu.problems import LinearForwardProblem
from dmip_tpu.utils import MetricsWriter, load_config, set_directories


def build_models(config, prob):
    snf = flows.create_snf(
        int(config["num_layers_INN"]), int(config["size_hidden_layers_INN"]),
        lambda x, ys: prob.log_posterior(x, ys)[:, 0],
        metr_steps_per_block=int(config["metr_steps_per_block"]),
        dimension=prob.xdim, dimension_condition=prob.ydim,
        noise_std=float(config["noise_std"]),
    )
    diffusion, loss_cfg = train.get_model_from_args(
        {**config, "loss_fn": "DSM"}, {"xdim": prob.xdim, "ydim": prob.ydim}
    )
    inn = flows.create_inn(
        int(config["num_layers_INN"]), int(config["size_hidden_layers_INN"]),
        dimension=prob.xdim, dimension_condition=prob.ydim,
    )
    return snf, (diffusion, loss_cfg), inn


def train_all(config, prob, snf, diffusion_pair, inn, x_train, y_train, key,
              log_dir, save_dir):
    diffusion, loss_cfg = diffusion_pair
    bs = int(config["batch_size"])
    batch_fn = lambda k: data.linear_epoch_batches(
        k, x_train, y_train, prob.noise_std, bs
    )
    logger = MetricsWriter(log_dir)
    k_snf, k_dsm, k_inn, key = jax.random.split(key, 4)

    # --- SNF (MCMC layers inside the loss -> keep epochs_per_call modest)
    snf_params = snf.init(k_snf)
    opt_snf = optax.adam(float(config["lr"]))
    snf_loss = lambda p, k, x, y: (flows.snf_ml_loss(snf, p, k, x, y), {})
    epoch_fn = train.make_epoch_fn(snf_loss, opt_snf, batch_fn, epochs_per_call=5)
    snf_params, _, _ = train.fit(
        epoch_fn, snf_params, opt_snf, k_snf,
        num_epochs=int(config["n_epochs_SNF"]), epochs_per_call=5,
        logger=logger, desc="snf",
    )

    # --- diffusion (DSM)
    d_params = diffusion.init(k_dsm)
    opt_d = optax.adam(float(config["lr"]))
    epoch_fn = train.make_epoch_fn(
        diffusion.make_loss_fn(loss_cfg), opt_d, batch_fn, epochs_per_call=25
    )
    d_params, _, _ = train.fit(
        epoch_fn, d_params, opt_d, k_dsm,
        num_epochs=int(config["n_epochs_dsm"]), epochs_per_call=25,
        logger=logger, desc="diffusion",
    )

    # --- INN
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

    os.makedirs(save_dir, exist_ok=True)
    checkpoints.save_checkpoint(os.path.join(save_dir, "snf"), snf_params)
    checkpoints.save_checkpoint(os.path.join(save_dir, "diffusion"), d_params)
    checkpoints.save_checkpoint(os.path.join(save_dir, "INN"), inn_params)
    return snf_params, d_params, inn_params


def evaluate_all(config, prob, snf, snf_params, diffusion, d_params, inn,
                 inn_params, ys, key, out_dir, nbins=75, xlim=(-3.5, 3.5)):
    n_x = int(config["n_samples_x"])
    n_repeats = int(config.get("n_repeats", 10))
    lo, hi = xlim
    base = diffusion.sde.base

    @jax.jit
    def eval_y(key, y):
        def one_repeat(k):
            k1, k2, k3, k4 = jax.random.split(k, 4)
            x_true = prob.sample_posterior(k1, y, n_x)
            x_diff = diffusion.sample(d_params, k2, y, n_x, 200)
            x_snf = snf.sample(snf_params, k3, y, n_x)
            x_inn = inn.sample(inn_params, k4, y, n_x)

            t0 = jnp.zeros((n_x, 1))
            ys_t = jnp.broadcast_to(y, (n_x, prob.ydim))
            score_pred = diffusion.apply_a(d_params, x_true, ys_t, t0) / base.g(t0)
            mse = jnp.mean(
                jnp.sum((score_pred - prob.score_posterior(x_true, ys_t)) ** 2, 1)
            )
            hists = [
                histogramdd_flat(s, nbins, lo, hi)
                for s in (x_true, x_snf, x_diff, x_inn)
            ]
            nlls = [
                -jnp.mean(prob.posterior_log_prob(s, y))
                for s in (x_true, x_snf, x_diff, x_inn)
            ]
            return hists, nlls, mse, (x_true, x_snf, x_diff, x_inn)

        keys = jax.random.split(key, n_repeats)
        hists, nlls, mse, samples = jax.lax.map(one_repeat, keys)
        hists = [jnp.sum(h, 0) for h in hists]
        nlls = [jnp.mean(v) for v in nlls]
        kls = [kl_pair(hists[0], hists[m])[0] for m in (1, 2, 3)]
        return kls, nlls, jnp.mean(mse), [s[-1] for s in samples]

    rows = []
    for i in range(ys.shape[0]):
        key, k = jax.random.split(key)
        kls, nlls, mse, last = eval_y(k, ys[i])
        rows.append(dict(
            KL1=float(kls[0]), KL2=float(kls[1]), KL3=float(kls[2]),
            NLL_true=float(nlls[0]), NLL_snf=float(nlls[1]),
            NLL_diffusion=float(nlls[2]), NLL_inn=float(nlls[3]),
            MSE=float(mse),
        ))
        if i in config.get("plot_ys", ()):
            from dmip_tpu.utils.plotting import plot_density

            for tag, arr in zip(("true", "snf", "diffusion", "inn"), last):
                plot_density(
                    np.asarray(arr), nbins, limits=xlim, xticks=list(xlim),
                    size=(12, 12), labelsize=30, show_mean=True,
                    fname=os.path.join(out_dir, f"posterior-{tag}-{i}.svg"),
                )
        print(
            f"y {i + 1}/{ys.shape[0]} KL snf={rows[-1]['KL1']:.3f} "
            f"diff={rows[-1]['KL2']:.3f} inn={rows[-1]['KL3']:.3f}",
            flush=True,
        )

    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, "results.csv"), "w", newline="") as f:
        w = csv.DictWriter(f, [""] + list(rows[0].keys()))
        w.writeheader()
        for i, r in enumerate(rows):
            w.writerow({"": i, **r})
    mean = {k: float(np.mean([r[k] for r in rows])) for k in rows[0]}
    print("means:", mean)
    return mean


def run(config):
    prob = LinearForwardProblem()
    key = jax.random.PRNGKey(int(config.get("random_state", 7)))
    k_data, k_split, k_train, k_eval = jax.random.split(key, 4)
    xs, ys = data.generate_dataset_linear(
        k_data, prob.xdim, prob.forward, int(config["dataset_size"])
    )
    x_train, x_test, y_train, y_test = data.train_test_split(
        k_split, xs, ys, float(config["train_size"])
    )
    snf, diffusion_pair, inn = build_models(config, prob)
    log_dir = set_directories(config["train_dir"], config["out_dir"])
    snf_p, d_p, inn_p = train_all(
        config, prob, snf, diffusion_pair, inn, x_train, y_train, k_train,
        log_dir, config["train_dir"],
    )
    return evaluate_all(
        config, prob, snf, snf_p, diffusion_pair[0], d_p, inn, inn_p,
        y_test[: int(config["n_samples_y"])], k_eval, config["out_dir"],
    )


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--config", default="configs/config_baselines_linear.yml")
    args = p.parse_args()
    run(load_config(args.config))
