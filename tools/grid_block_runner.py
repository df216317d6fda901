"""Per-block train+eval driver for the 10-repeat grid re-score (round 5).

`run_grid_search_scatterometry.py` trains ALL ensemble blocks (phase 1)
before evaluating ANY trial (phase 2) — fine for a full run, but a
wall-clock-bounded session wants completed 10-repeat rows as early as
possible.  This driver serializes the grid BLOCK BY BLOCK: for each
ensemble-structure block it writes a restricted config (params narrowed to
that block) and invokes the grid main, which trains the block (or reuses
its per-trial checkpoints — skip_existing) and evaluates its trials before
the next block trains.  Interrupt anywhere: completed rows and checkpoints
resume for free.

Merge completed rows into the committed summary afterwards:
  python tools/summarize_grid.py \
      --src_dir grid_search_results/scatterometry_20k_10rep \
      --protocol "full:20k-epochs,100ysx10rep" \
      --merge_into benchmarks/grid_summary_scatterometry_20k.csv \
      --out benchmarks/grid_summary_scatterometry_20k.csv

Usage: python tools/grid_block_runner.py [--blocks b1,b5,...] [--dry_run]
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import yaml

BASE = "configs/config_gridsearch_scatterometry_20k_10rep.yml"

# PINNLoss blocks are 20 trials (5 lam x 4 lam2); d1 covers the 15
# deduplicated DSM_PDE trials.  Ordered so the grid's best-performing
# structures re-score first.
BLOCKS = {
    "b1": {"loss_fn": ["PINNLoss"], "pde_loss": ["FPE"],
           "pde_metric": ["L1"], "ic_metric": ["L1"]},
    "b5": {"loss_fn": ["PINNLoss"], "pde_loss": ["cScoreFPE"],
           "pde_metric": ["L2"], "ic_metric": ["L1"]},
    "b6": {"loss_fn": ["PINNLoss"], "pde_loss": ["cScoreFPE"],
           "pde_metric": ["L2"], "ic_metric": ["L2"]},
    "b2": {"loss_fn": ["PINNLoss"], "pde_loss": ["FPE"],
           "pde_metric": ["L1"], "ic_metric": ["L2"]},
    "b3": {"loss_fn": ["PINNLoss"], "pde_loss": ["FPE"],
           "pde_metric": ["L2"], "ic_metric": ["L1"]},
    "b4": {"loss_fn": ["PINNLoss"], "pde_loss": ["FPE"],
           "pde_metric": ["L2"], "ic_metric": ["L2"]},
    "d1": {"loss_fn": ["DSM_PDE"], "pde_loss": ["FPE", "cScoreFPE"],
           "pde_metric": ["L1", "L2"], "ic_metric": ["L1"]},
}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--blocks", default=",".join(BLOCKS))
    p.add_argument("--out_dir", default="grid_search_results/block_configs")
    p.add_argument("--timeout", type=int, default=14400)
    p.add_argument("--dry_run", action="store_true")
    args = p.parse_args()

    with open(BASE) as f:
        base = yaml.safe_load(f)
    os.makedirs(args.out_dir, exist_ok=True)

    for name in args.blocks.split(","):
        cfg = dict(base)
        cfg["params"] = {**base["params"], **BLOCKS[name]}
        path = os.path.join(args.out_dir, f"{name}.yml")
        with open(path, "w") as f:
            yaml.safe_dump(cfg, f)
        print(f"=== block {name} start {time.ctime()} ===", flush=True)
        if args.dry_run:
            continue
        rc = subprocess.call(
            [sys.executable, "mains/run_grid_search_scatterometry.py",
             "--config", path],
            timeout=args.timeout,
        )
        print(f"=== block {name} exit={rc} {time.ctime()} ===", flush=True)


if __name__ == "__main__":
    main()
