"""DPS (PosteriorDiffusionEstimator) hyper-parameter sweep on scatterometry.

Round-1 shipped DPS as a pipeline demonstration (lam=1.0, 3k epochs,
KL 3.20); this sweep trains a lam-ensemble (dmip_tpu.ensemble — all trials
in ONE jitted scan), ranks the lams with a cheap selection protocol, then
re-evaluates the winner with the full reference protocol and saves its
checkpoint + results.csv.

Usage: PYTHONPATH=.:/root/.axon_site python tools/dps_sweep.py \
          [--epochs 10000] [--gt_dir data/gt_samples_scatterometry]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
import optax

from dmip_tpu import checkpoints, data, ensemble, evaluate, train
from tools import common


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--epochs", type=int, default=10000)
    p.add_argument("--gt_dir", default="data/gt_samples_scatterometry")
    p.add_argument("--out_dir", default="results/scatterometry_dps_sweep")
    p.add_argument("--train_dir", default="trained_models/scatterometry_dps_sweep")
    p.add_argument("--lams", default="3.0,1.0,0.3,0.1,0.03")
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--select_ys", type=int, default=20)
    p.add_argument("--select_repeats", type=int, default=3)
    args = p.parse_args()

    lams = [float(v) for v in args.lams.split(",")]
    s = common.scat_setup()
    forward_model, fparams = s.forward_model, s.fparams
    y_test, score_post = s.y_test, s.score_post
    k_init, k_train, k_eval = s.k_init, s.k_train, s.k_eval

    model, cfg = train.get_model_from_args(
        {"model": "Posterior", "lam": 1.0, "hidden_layers": [512, 512, 512]},
        fparams,
    )
    batch_fn = lambda k: data.scatterometry_epoch_batches(
        k, forward_model, fparams["a"], fparams["b"], fparams["lambd_bd"], 1000
    )
    loss_kwargs = {"forward_model": forward_model, "forward_params": fparams}

    K = len(lams)
    opt = optax.adam(args.lr)
    epoch_fn = ensemble.make_ensemble_epoch_fn(
        model, cfg, opt, batch_fn, epochs_per_call=100,
        loss_kwargs=loss_kwargs,
    )
    ens = ensemble.init_ensemble(model, k_init, K)
    t0 = time.time()
    ens, hist = ensemble.ensemble_fit(
        epoch_fn, ens, opt, k_train, args.epochs,
        jnp.asarray(lams, jnp.float32), jnp.ones(K, jnp.float32),
        epochs_per_call=100, desc="dps-sweep",
    )
    print(f"ensemble train: {time.time() - t0:.0f}s", flush=True)

    gt_loader = common.gt_loader(args.gt_dir)
    scores = []
    for i, lam in enumerate(lams):
        params = ensemble.trial_params(jax.device_get(ens), i)
        kl, nlpd, mse = evaluate.evaluate_scatterometry(
            model, params, forward_model, fparams, score_post,
            y_test[: args.select_ys], gt_loader, k_eval,
            n_samples_x=30000, n_repeats=args.select_repeats, verbose=False,
        )
        scores.append(kl)
        print(f"lam={lam}: selection KL={kl:.4f} NLPD={nlpd:.4f}", flush=True)

    best = int(np.argmin(scores))
    print(f"best lam={lams[best]} (selection KL {scores[best]:.4f})",
          flush=True)
    params = ensemble.trial_params(jax.device_get(ens), best)
    checkpoints.save_checkpoint(
        os.path.join(args.train_dir, "checkpoint"), params, opt_state=None,
        step=args.epochs, key=k_train, extra={"lam": lams[best]},
    )
    kl, nlpd, mse = evaluate.evaluate_scatterometry(
        model, params, forward_model, fparams, score_post,
        y_test, gt_loader, k_eval, out_dir=args.out_dir,
        n_samples_x=30000, n_repeats=10,
    )
    print(f"FULL protocol: lam={lams[best]} KL={kl:.4f} NLPD={nlpd:.4f} "
          f"MSE={mse:.4f}", flush=True)


if __name__ == "__main__":
    main()
