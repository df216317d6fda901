"""NFE-efficiency at the FULL reference protocol: expint vs 200-step E-M.

Round 4 added exponential integrators (samplers.exponential_integrator,
DPM-Solver family) and measured them on moment errors: ~6x fewer net
evaluations than 200-step Euler-Maruyama at equal accuracy on the linear
oracle.  This tool answers the end-to-end question the moment test cannot:
at the reference's own scatterometry evaluation protocol (100 ys x
n_repeats x 30k samples, 75^3 histogram KL vs MCMC ground truth —
/root/reference/main_diffusion_scatterometry.py:94-122), does an
expint-N sampler reproduce the EM-200 row's KL/rev-KL/NLPD/W2, and what
does the NFE saving do to measured eval wall-clock?

Each setting runs the identical evaluate_scatterometry protocol (same
keys, same GT) with only (method, num_steps) swapped; rows print as they
finish and land in results/expint_eval/summary.csv.

Usage:
  PYTHONPATH=. python tools/expint_eval.py --repeats 10 \
      --settings auto@200,expint:sde:1@32,expint:sde:1@64
"""

from __future__ import annotations

import argparse
import csv
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from dmip_tpu import evaluate, train
from tools import common


def parse_settings(spec: str):
    """'auto@200,expint:sde:1@32' -> [('auto', 200), ('expint:sde:1', 32)]."""
    out = []
    for part in spec.split(","):
        method, steps = part.rsplit("@", 1)
        out.append((method, int(steps)))
    return out


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--checkpoint", default="benchmarks/checkpoints/cde_500k")
    p.add_argument("--gt_dir", default="data/gt_samples_scatterometry")
    p.add_argument("--n_ys", type=int, default=100)
    p.add_argument("--repeats", type=int, default=10)
    p.add_argument("--n_samples", type=int, default=30000)
    p.add_argument(
        "--settings",
        default="auto@200,expint:sde:1@16,expint:sde:1@32,expint:sde:1@64,"
                "expint:ode:2@32",
        help="comma-separated method@num_steps; for expint, num_steps is "
             "the NFE budget (plus one final denoise call)")
    p.add_argument("--out_dir", default="results/expint_eval")
    args = p.parse_args()

    s = common.scat_setup(n_ys=args.n_ys)
    model, _ = train.get_model_from_args(common.BEST_TRIAL_CFG, s.fparams)
    params, ckpt_path = common.resolve_checkpoint(
        model.init(s.k_init), [args.checkpoint], label="proposal checkpoint")
    gt = common.gt_loader(args.gt_dir)

    rows = []
    for method, steps in parse_settings(args.settings):
        label = f"{method}@{steps}".replace(":", "-").replace("@", "_")
        out_dir = os.path.join(args.out_dir, label)
        # NFE per posterior sample: expint appends one exact denoise call.
        nfe = steps + 1 if method.startswith("expint") else steps
        t0 = time.time()
        kl, nlpd, mse = evaluate.evaluate_scatterometry(
            model, params, s.forward_model, s.fparams, s.score_post,
            s.y_test, gt, s.k_eval, out_dir=out_dir,
            n_samples_x=args.n_samples, n_repeats=args.repeats,
            num_steps=steps, method=method, verbose=False,
            progress_every=200,
        )
        wall = time.time() - t0
        with open(os.path.join(out_dir, "results.csv")) as f:
            cols = list(csv.DictReader(f))
        kl_rev = float(np.mean([float(r["KL_reverse"]) for r in cols]))
        w2 = float(np.mean([float(r["W2"]) for r in cols]))
        rows.append(dict(method=method, num_steps=steps, nfe=nfe, kl=kl,
                         kl_rev=kl_rev, nlpd=nlpd, w2=w2, mse=mse,
                         wall_s=wall))
        print(f"{method}@{steps}: NFE={nfe} KL={kl:.4f} rev={kl_rev:.4f} "
              f"NLPD={nlpd:.4f} W2={w2:.4f} wall={wall:.1f}s", flush=True)

    os.makedirs(args.out_dir, exist_ok=True)
    with open(os.path.join(args.out_dir, "summary.csv"), "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=list(rows[0].keys()))
        w.writeheader()
        w.writerows(rows)
    print(f"checkpoint: {ckpt_path}")
    print(f"summary -> {os.path.join(args.out_dir, 'summary.csv')}")


if __name__ == "__main__":
    main()
