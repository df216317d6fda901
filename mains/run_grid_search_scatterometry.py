"""Grid-search driver, scatterometry (reference run_grid_search_scatterometry.py).

Usage: python mains/run_grid_search_scatterometry.py \
          [--config configs/config_gridsearch_scatterometry.yml] \
          [--gt_dir data/gt_samples_scatterometry] [--host 0 --n_hosts 1]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from dmip_tpu import data, evaluate, gridsearch, train
from dmip_tpu.problems import scatterometry as scat
from dmip_tpu.utils import MetricsWriter, load_config


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--config", default="configs/config_gridsearch_scatterometry.yml")
    p.add_argument("--gt_dir", default="data/gt_samples_scatterometry")
    p.add_argument("--host", type=int, default=0)
    p.add_argument("--n_hosts", type=int, default=1)
    args = p.parse_args()
    config = load_config(args.config)

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
    epc = int(config.get("epochs_per_call", 100))

    def train_fn(model, loss_cfg, trial_cfg, train_dir, log_dir):
        loss_fn = model.make_loss_fn(
            loss_cfg, initial_condition=score_post,
            forward_model=forward_model, forward_params=fparams,
        )
        params = model.init(k_init)
        optimizer = train.build_optimizer(float(config["lr"]), config.get("grad_clip"))
        epoch_fn = train.make_epoch_fn(
            loss_fn, optimizer,
            lambda k: data.scatterometry_epoch_batches(
                k, forward_model, fparams["a"], fparams["b"],
                fparams["lambd_bd"], int(config["batch_size"]),
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

    # device-resident GT cache: every trial re-evaluates against the same
    # ground truth, so upload each (i, j) array once (data.cached_gt_loader)
    gt_loader = (data.cached_gt_loader(args.gt_dir)
                 if config.get("eval_gt_cache", True)
                 else data.gt_loader(args.gt_dir))

    def eval_fn(model, params, y_eval, out_dir):
        return evaluate.evaluate_scatterometry(
            model, params, forward_model, fparams, score_post,
            y_eval, gt_loader, k_eval,
            out_dir=out_dir, plot_ys=config.get("plot_ys", ()),
            n_samples_x=int(config["n_samples_x"]),
            # selection protocol: fewer repeats rank trials at a fraction of
            # the full protocol's cost (absolute KL is repeat-count-biased;
            # re-evaluate finalists with the full protocol)
            n_repeats=int(config.get("eval_n_repeats", 10)),
            num_steps=int(config.get("eval_num_steps", 200)),
            # single-device dispatch amortization: vmap eval_chunk conditions
            # into one call (equality-tested vs the sequential walk)
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
            lambda k: data.scatterometry_epoch_batches(
                k, forward_model, fparams["a"], fparams["b"],
                fparams["lambd_bd"], int(config["batch_size"]),
            ),
            k_init, k_train, float(config["lr"]),
            n_epochs=int(config["n_epochs"]), epochs_per_call=epc,
            loss_kwargs={
                "initial_condition": score_post,
                "forward_model": forward_model,
                "forward_params": fparams,
            },
            grad_clip=config.get("grad_clip"),
            backend=str(config.get("ensemble_backend", "auto")),
        )

    gridsearch.grid_search(
        y_test, config, fparams, train_fn, eval_fn, {}, {},
        trial_filter=trial_filter, train_many=train_many,
        skip_existing=bool(config.get("skip_existing", False)),
    )


if __name__ == "__main__":
    main()
