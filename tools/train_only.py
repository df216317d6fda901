"""Train a scatterometry model from a config and save its checkpoint — no eval.

The experiment drivers (mains/main_diffusion_scatterometry.py) always run the
full reference evaluation protocol after training.  When rebuilding wiped
checkpoint artifacts (gitignored trained_models/ trees) for eval-only tools
like tools/dps_guidance_sweep.py, that evaluation is wasted TPU time.  This
tool runs ONLY the training + checkpoint-save portion of the driver.

Usage: python tools/train_only.py --config configs/config_scatterometry_dps.yml
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from dmip_tpu import checkpoints, data, train
from dmip_tpu.problems import scatterometry as scat
from dmip_tpu.utils.config import load_config
from dmip_tpu.utils.metrics import MetricsWriter


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--config", default="configs/config_scatterometry_dps.yml")
    p.add_argument("--n_epochs", type=int, default=None,
                   help="override the config's n_epochs")
    args = p.parse_args()
    config = load_config(args.config)
    if args.n_epochs is not None:
        config["n_epochs"] = args.n_epochs

    forward_model, fparams = scat.load_forward_model()
    score_post = scat.score_posterior(
        forward_model, fparams["a"], fparams["b"], fparams["lambd_bd"]
    )
    key = jax.random.PRNGKey(int(config.get("RANDOM_STATE", 13)))
    _k_data, k_init, k_train, _k_eval = jax.random.split(key, 4)

    model, loss_cfg = train.get_model_from_args(config, fparams)
    loss_fn = model.make_loss_fn(
        loss_cfg, initial_condition=score_post,
        forward_model=forward_model, forward_params=fparams,
    )
    params = model.init(k_init)

    ckpt_dir = os.path.join(config["train_dir"], "checkpoint")
    optimizer = train.build_optimizer(
        float(config.get("lr", 1e-4)), config.get("grad_clip"),
        schedule=config.get("lr_schedule"),
        decay_steps=int(config["n_epochs"])
        * data.SCATTEROMETRY_BATCHES_PER_EPOCH,
        lr_min_ratio=float(config.get("lr_min_ratio", 0.01)),
    )
    os.makedirs(config["train_dir"], exist_ok=True)
    epc = int(config.get("epochs_per_call", 100))
    epoch_fn = train.make_epoch_fn(
        loss_fn,
        optimizer,
        lambda k: data.scatterometry_epoch_batches(
            k, forward_model, fparams["a"], fparams["b"], fparams["lambd_bd"],
            int(config["batch_size"]),
        ),
        epochs_per_call=epc,
        mesh=config.get("mesh", "auto"),
    )
    with MetricsWriter(config["train_dir"]) as logger:
        params, opt_state, _ = train.fit(
            epoch_fn, params, optimizer, k_train,
            num_epochs=int(config["n_epochs"]), epochs_per_call=epc,
            logger=logger, desc="train-only",
        )
    checkpoints.save_checkpoint(
        ckpt_dir, params, opt_state=opt_state,
        step=int(config["n_epochs"]), key=k_train,
    )
    print(f"saved {ckpt_dir} at epoch {config['n_epochs']}")


if __name__ == "__main__":
    main()
