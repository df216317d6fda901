"""Grid-search driver, linear problem (reference run_grid_search_linear.py).

Usage: python mains/run_grid_search_linear.py \
          [--config configs/config_gridsearch_linear.yml] [--host 0 --n_hosts 1]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from dmip_tpu import data, evaluate, gridsearch, train
from dmip_tpu.problems import LinearForwardProblem
from dmip_tpu.utils import MetricsWriter, load_config


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--config", default="configs/config_gridsearch_linear.yml")
    p.add_argument("--host", type=int, default=0)
    p.add_argument("--n_hosts", type=int, default=1)
    args = p.parse_args()
    config = load_config(args.config)

    prob = LinearForwardProblem()
    key = jax.random.PRNGKey(int(config.get("random_state", 7)))
    k_data, k_split, k_init, k_train, k_eval = jax.random.split(key, 5)
    xs, ys = data.generate_dataset_linear(
        k_data, prob.xdim, prob.forward, int(config["dataset_size"])
    )
    x_train, x_test, y_train, y_test = data.train_test_split(
        k_split, xs, ys, float(config["train_size"])
    )
    epc = int(config.get("epochs_per_call", 25))

    def train_fn(model, loss_cfg, trial_cfg, train_dir, log_dir):
        loss_fn = model.make_loss_fn(
            loss_cfg, initial_condition=prob.score_posterior
        )
        params = model.init(k_init)
        optimizer = train.build_optimizer(float(config["lr"]), config.get("grad_clip"))
        epoch_fn = train.make_epoch_fn(
            loss_fn, optimizer,
            lambda k: data.linear_epoch_batches(
                k, x_train, y_train, prob.noise_std, int(config["batch_size"])
            ),
            epochs_per_call=epc,
        )
        with MetricsWriter(log_dir) as logger:
            params, _, _ = train.fit(
                epoch_fn, params, optimizer, k_train,
                num_epochs=int(config["n_epochs"]), epochs_per_call=epc,
                logger=logger, desc=os.path.basename(train_dir),
            )
        return params

    def eval_fn(model, params, y_eval, out_dir):
        return evaluate.evaluate_linear(
            model, params, prob, y_eval, k_eval,
            out_dir=out_dir, plot_ys=config.get("plot_ys", ()),
            n_samples_x=int(config["n_samples_x"]),
            n_repeats=int(config.get("eval_n_repeats", 10)),
            num_steps=int(config.get("eval_num_steps", 200)),
            chunk=int(config.get("eval_chunk", 0)) or None,
        )

    trial_filter = None
    if args.n_hosts > 1:
        trial_filter = lambda idx, cfg: idx % args.n_hosts == args.host

    # Trial-parallel: same-structure trials (different lam/lam2) train as a
    # vmapped ensemble sharded over the mesh (dmip_tpu.ensemble).
    train_many = None
    if not config.get("no_ensemble"):
        from dmip_tpu import ensemble

        train_many = ensemble.make_train_many(
            lambda k: data.linear_epoch_batches(
                k, x_train, y_train, prob.noise_std, int(config["batch_size"])
            ),
            k_init, k_train, float(config["lr"]),
            n_epochs=int(config["n_epochs"]), epochs_per_call=epc,
            loss_kwargs={"initial_condition": prob.score_posterior},
            grad_clip=config.get("grad_clip"),
            backend=str(config.get("ensemble_backend", "auto")),
        )

    gridsearch.grid_search(
        y_test[: int(config["n_samples_y"])], config,
        {"xdim": prob.xdim, "ydim": prob.ydim},
        train_fn, eval_fn, {}, {}, trial_filter=trial_filter,
        train_many=train_many,
        skip_existing=bool(config.get("skip_existing", False)),
    )


if __name__ == "__main__":
    main()
