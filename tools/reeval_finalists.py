"""Re-evaluate grid-search finalists with the FULL reference protocol.

The reference-scale grid ranks trials with a cheap selection protocol
(configs/config_gridsearch_scatterometry_full.yml: 50 ys x 2 repeats); this
tool walks the grid tree, picks the top-K trials by selection KL, reloads
their checkpoints (saved by dmip_tpu.ensemble.make_train_many), and runs the
reference protocol (100 ys x 10 repeats x 30k) on each.

With ``--retrain_epochs N`` each finalist is instead RETRAINED from scratch
for N epochs (the reference's full 20k schedule; same init/train seeds the
grid used) before the full-protocol evaluation — the second stage of the
two-stage selection protocol in config_gridsearch_scatterometry_full.yml.

Usage: PYTHONPATH=.:/root/.axon_site python tools/reeval_finalists.py \
          --src_dir grid_search_results/scatterometry_full --top 3 \
          [--retrain_epochs 20000]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from dmip_tpu import checkpoints, data, evaluate, gridsearch, train
from tools import common


def collect_trials(src_dir: str):
    """(mean selection KL, trial dir, params-from-path) for every results.csv."""
    rows = []
    for root, _dirs, files in os.walk(src_dir):
        if "results.csv" not in files or os.path.basename(root) != "results":
            continue
        cols = gridsearch._read_results_csv(os.path.join(root, "results.csv"))
        if "KL2" not in cols:
            continue
        tdir = os.path.dirname(root)
        rows.append((float(np.mean(cols["KL2"])), tdir,
                     gridsearch.get_params_from_path(tdir)))
    rows.sort(key=lambda r: r[0])
    return rows


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--src_dir", default="grid_search_results/scatterometry_full")
    p.add_argument("--top", type=int, default=3)
    p.add_argument("--ranks", default=None,
                   help="comma-separated rank indices into the selection-KL "
                        "ordering (overrides --top; lets the finalist set "
                        "stay diverse when the top ranks are near-duplicate "
                        "hyper-parameter neighbours)")
    p.add_argument("--gt_dir", default="data/gt_samples_scatterometry")
    p.add_argument("--hidden", default="512,512,512")
    p.add_argument("--n_samples_y", type=int, default=100)
    p.add_argument("--retrain_epochs", type=int, default=0,
                   help="retrain each finalist from scratch for this many "
                        "epochs before the full eval (0 = reuse checkpoint)")
    p.add_argument("--batch_size", type=int, default=1000)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--epochs_per_call", type=int, default=100)
    args = p.parse_args()

    trials = collect_trials(args.src_dir)
    if args.ranks:
        picked = [trials[int(r)] for r in args.ranks.split(",")]
    else:
        picked = trials[: args.top]
    print(f"{len(trials)} trials found; {len(picked)} finalists by selection KL:")
    for kl, tdir, params in picked:
        print(f"  sel-KL={kl:.4f}  {params}  ({tdir})")

    s = common.scat_setup(n_ys=args.n_samples_y)
    forward_model, fparams = s.forward_model, s.fparams
    y_test, score_post = s.y_test, s.score_post
    k_init, k_eval = s.k_init, s.k_eval
    gt_loader = common.gt_loader(args.gt_dir)
    hidden = [int(v) for v in args.hidden.split(",")]

    k_train = s.k_train  # the grid's own training-key schedule
    for sel_kl, tdir, trial_params in picked:
        factory_cfg = {
            "model": "CDE", "hidden_layers": hidden, **trial_params,
            "loss_fn": trial_params.get("loss_fn", "PINNLoss")
            .replace("DSM_PDELoss", "DSM_PDE"),
        }
        model, loss_cfg = train.get_model_from_args(factory_cfg, fparams)

        if args.retrain_epochs > 0:
            import optax

            loss_fn = model.make_loss_fn(
                loss_cfg, initial_condition=score_post,
                forward_model=forward_model, forward_params=fparams,
            )
            optimizer = optax.adam(args.lr)
            epoch_fn = train.make_epoch_fn(
                loss_fn, optimizer,
                lambda k: data.scatterometry_epoch_batches(
                    k, forward_model, fparams["a"], fparams["b"],
                    fparams["lambd_bd"], args.batch_size,
                ),
                epochs_per_call=args.epochs_per_call,
            )
            params, _, _ = train.fit(
                epoch_fn, model.init(k_init), optimizer, k_train,
                num_epochs=args.retrain_epochs,
                epochs_per_call=args.epochs_per_call,
                desc=f"retrain:{os.path.basename(tdir)}",
            )
            checkpoints.save_checkpoint(
                os.path.join(tdir, "checkpoint_full"), params,
                step=args.retrain_epochs, key=k_train,
            )
        else:
            params, _ = common.resolve_checkpoint(
                model.init(k_init), [os.path.join(tdir, "checkpoint")],
                label="finalist checkpoint",
            )

        out_dir = os.path.join(tdir, "results_full")
        kl, nlpd, mse = evaluate.evaluate_scatterometry(
            model, params, forward_model, fparams, score_post,
            y_test, gt_loader, k_eval, out_dir=out_dir,
            n_samples_x=30000, n_repeats=10, verbose=False,
        )
        print(f"FULL: sel-KL={sel_kl:.4f} -> KL={kl:.4f} NLPD={nlpd:.4f} "
              f"MSE={mse:.4f}  {trial_params}", flush=True)


if __name__ == "__main__":
    main()
