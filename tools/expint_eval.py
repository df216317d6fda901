"""NFE-efficiency at the FULL reference protocol: expint vs 200-step E-M.

Round 4 added exponential integrators (samplers.exponential_integrator,
DPM-Solver family) and measured them on moment errors: ~6x fewer net
evaluations than 200-step Euler-Maruyama at equal accuracy on the linear
oracle.  This tool answers the end-to-end question the moment test cannot:
at the reference's own evaluation protocols (scatterometry: 100 ys x
n_repeats x 30k, 75^3 histogram KL vs MCMC ground truth —
/root/reference/main_diffusion_scatterometry.py:94-122; linear: histogram
KL vs the analytic posterior, main_diffusion_linear.py:65-131), does an
expint-N sampler reproduce the EM-200 row's metrics, and what does the
NFE saving do to measured eval wall-clock?

Each setting runs the identical evaluate_* protocol (same keys, same GT)
with only (method, num_steps) swapped; rows print as they finish and land
in results/expint_eval/<problem>/summary.csv.

Usage:
  PYTHONPATH=. python tools/expint_eval.py --repeats 10 \
      --settings auto@200,expint:sde:1@32,expint:sde:1@64
  PYTHONPATH=. python tools/expint_eval.py --problem linear \
      --n_ys 50 --repeats 2
"""

from __future__ import annotations

import argparse
import csv
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

from dmip_tpu import data, evaluate, train
from tools import common


def parse_settings(spec: str):
    """'auto@200,expint:sde:1@32' -> [('auto', 200), ('expint:sde:1', 32)].

    Each entry must match method@num_steps (method may itself contain ':'
    qualifiers); a malformed token raises a ValueError naming it."""
    out = []
    for part in spec.split(","):
        part = part.strip()
        if not part:
            continue
        if "@" not in part:
            raise ValueError(
                f"bad --settings entry {part!r}: expected method@num_steps "
                "(e.g. auto@200 or expint:sde:1@32)")
        method, steps = part.rsplit("@", 1)
        if not method or not steps.isdigit():
            raise ValueError(
                f"bad --settings entry {part!r}: num_steps must be an "
                "integer (method@num_steps grammar)")
        out.append((method, int(steps)))
    if not out:
        raise ValueError(f"--settings {spec!r} parsed to an empty list")
    return out


def nfe_of(method: str, steps: int) -> int:
    """Net evaluations per posterior sample (expint appends a final exact
    denoise call; heun is two evaluations per step)."""
    if method.startswith("expint"):
        return steps + 1
    if method == "heun":
        return 2 * steps
    return steps


def scat_runner(args):
    s = common.scat_setup(n_ys=args.n_ys)
    model, _ = train.get_model_from_args(common.BEST_TRIAL_CFG, s.fparams)
    params, _ = common.resolve_checkpoint(
        model.init(s.k_init), [args.checkpoint], label="proposal checkpoint")
    gt = common.gt_loader(args.gt_dir)

    def run(method, steps, out_dir):
        return evaluate.evaluate_scatterometry(
            model, params, s.forward_model, s.fparams, s.score_post,
            s.y_test, gt, s.k_eval, out_dir=out_dir,
            n_samples_x=args.n_samples, n_repeats=args.repeats,
            num_steps=steps, method=method, verbose=False,
            progress_every=200,
        )

    return run


def linear_runner(args):
    from dmip_tpu.problems import LinearForwardProblem

    prob = LinearForwardProblem()
    # Identical key schedule to mains/main_diffusion_linear.py (random_state
    # 7), so rows are comparable to the BENCHMARKS.md linear table.
    key = jax.random.PRNGKey(7)
    k_data, k_split, k_init, _k_train, k_eval = jax.random.split(key, 5)
    xs, ys = data.generate_dataset_linear(k_data, prob.xdim, prob.forward,
                                          100000)
    _, _, _, y_test = data.train_test_split(k_split, xs, ys, 0.9)

    cfg = {"model": "CDE", "loss_fn": "PINNLoss", "pde_loss": "cScoreFPE",
           "pde_metric": "L2", "ic_metric": "L2", "lam": 0.01, "lam2": 1.0,
           "hidden_layers": [512, 512, 512]}
    model, _ = train.get_model_from_args(
        cfg, {"xdim": prob.xdim, "ydim": prob.ydim})
    params, _ = common.resolve_checkpoint(
        model.init(k_init), [args.checkpoint], label="linear checkpoint")

    def run(method, steps, out_dir):
        return evaluate.evaluate_linear(
            model, params, prob, y_test[: args.n_ys], k_eval,
            out_dir=out_dir, n_samples_x=args.n_samples,
            n_repeats=args.repeats, num_steps=steps, method=method,
            verbose=False,
        )

    return run


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--problem", choices=("scatterometry", "linear"),
                   default="scatterometry")
    p.add_argument("--checkpoint", default=None,
                   help="defaults to the flagship archive for the problem")
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
    p.add_argument("--out_dir", default=None)
    args = p.parse_args()
    if args.checkpoint is None:
        args.checkpoint = {
            "scatterometry": "benchmarks/checkpoints/cde_500k",
            "linear": "benchmarks/checkpoints/linear_refined_winner",
        }[args.problem]
    if args.out_dir is None:
        args.out_dir = os.path.join("results", "expint_eval", args.problem)

    runner = (scat_runner if args.problem == "scatterometry"
              else linear_runner)(args)

    summary_path = os.path.join(args.out_dir, "summary.csv")

    def write_summary(rows):
        # rewritten after EVERY setting so a crash in a later (larger)
        # setting keeps the completed aggregate rows on disk
        os.makedirs(args.out_dir, exist_ok=True)
        with open(summary_path, "w", newline="") as f:
            w = csv.DictWriter(f, fieldnames=list(rows[0].keys()))
            w.writeheader()
            w.writerows(rows)

    rows = []
    for method, steps in parse_settings(args.settings):
        label = f"{method}@{steps}".replace(":", "-").replace("@", "_")
        out_dir = os.path.join(args.out_dir, label)
        t0 = time.time()
        kl, nlpd, mse = runner(method, steps, out_dir)
        wall = time.time() - t0
        with open(os.path.join(out_dir, "results.csv")) as f:
            cols = list(csv.DictReader(f))
        kl_rev = (float(np.mean([float(r["KL_reverse"]) for r in cols]))
                  if "KL_reverse" in cols[0] else float("nan"))
        w2 = float(np.mean([float(r["W2"]) for r in cols]))
        rows.append(dict(method=method, num_steps=steps,
                         nfe=nfe_of(method, steps), kl=kl, kl_rev=kl_rev,
                         nlpd=nlpd, w2=w2, mse=mse, wall_s=round(wall, 1)))
        write_summary(rows)
        print(f"{method}@{steps}: NFE={rows[-1]['nfe']} KL={kl:.4f} "
              f"rev={kl_rev:.4f} NLPD={nlpd:.4f} W2={w2:.4f} "
              f"wall={wall:.1f}s", flush=True)
    print(f"summary -> {summary_path}")


if __name__ == "__main__":
    main()
