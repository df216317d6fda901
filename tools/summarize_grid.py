"""Post-hoc grid summary: walk a grid-search results tree and write one CSV
row per trial (params + mean KL/NLPD/score-MSE).

Complements the summary grid_search itself writes (dmip_tpu/gridsearch.py)
for runs that predate it or died mid-grid; the ``--out`` copy goes to a
committed location so grid results survive the gitignored results trees
(BENCHMARKS.md quotes it).

Usage: PYTHONPATH=. python tools/summarize_grid.py \
          --src_dir grid_search_results/scatterometry_full \
          [--out benchmarks/grid_summary_scatterometry_full.csv]
"""

from __future__ import annotations

import argparse
import csv
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from dmip_tpu import gridsearch


def collect(src_dir: str, protocol: str = "", protocol_full: str = ""):
    """One summary row per trial.  When a trial also carries a
    ``results_full/results.csv`` (written by tools/reeval_finalists.py's
    full-protocol re-score), that table takes PRECEDENCE and the row is
    tagged ``protocol_full`` — so re-scored rows are directly comparable to
    the headline tables while the rest keep the grid's own protocol tag."""
    rows = []
    for root, _dirs, files in os.walk(src_dir):
        if "results.csv" not in files or os.path.basename(root) != "results":
            continue
        tdir = os.path.dirname(root)
        csv_path = os.path.join(root, "results.csv")
        row_protocol = protocol
        full_path = os.path.join(tdir, "results_full", "results.csv")
        if protocol_full and os.path.exists(full_path):
            csv_path = full_path
            row_protocol = protocol_full
        cols = gridsearch._read_results_csv(csv_path)
        if "KL2" not in cols:
            continue
        params = gridsearch.get_params_from_path(tdir)
        n_conditions = len(cols["KL2"])
        nll_true_col = next(
            (c for c in ("NLL_true", "NLL_mcmc") if c in cols), None
        )
        nlpd = (
            float(np.mean(np.abs(cols["NLL_diffusion"] - cols[nll_true_col])))
            if nll_true_col and "NLL_diffusion" in cols else float("nan")
        )
        rows.append({
            **params,
            # mark the evaluation protocol per row: absolute KLs from a
            # reduced selection pass (few repeats -> sparse histograms) are
            # NOT comparable with full-protocol numbers (round-2 verdict:
            # sel-KLs run ~1.7-4x high)
            "protocol": row_protocol,
            "n_conditions": n_conditions,
            "kl": float(np.mean(cols["KL2"])),
            "kl_reverse": float(np.mean(cols["KL_reverse"]))
            if "KL_reverse" in cols else float("nan"),
            "nlpd": nlpd,
            "fisher": float(np.mean(cols["MSE"]))
            if "MSE" in cols else float("nan"),
            # sliced-W2 vs ground truth (column added round 3; older
            # results.csv files predate it)
            "w2": float(np.mean(cols["W2"]))
            if "W2" in cols else float("nan"),
        })
    rows.sort(key=lambda r: r["kl"])
    return rows


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--src_dir", default="grid_search_results/scatterometry_full")
    p.add_argument("--out", default=None,
                   help="extra (committable) copy of the summary CSV")
    p.add_argument("--protocol", default="",
                   help="evaluation-protocol tag recorded on every row, "
                        "e.g. 'selection:4k-epochs,20ysx2rep' or "
                        "'full:20k-epochs,100ysx10rep'")
    p.add_argument("--protocol_full", default="",
                   help="tag for trials that carry a results_full re-score "
                        "(tools/reeval_finalists.py); those tables take "
                        "precedence over the trial's own results.csv")
    p.add_argument("--merge_into", default=None,
                   help="existing summary CSV: rows whose trial params "
                        "match a freshly collected trial are REPLACED (e.g. "
                        "a 10-repeat re-run superseding a 5-repeat row); "
                        "all other rows are kept")
    args = p.parse_args()

    rows = collect(args.src_dir, args.protocol, args.protocol_full)
    if not rows:
        sys.exit(f"no results under {args.src_dir}")

    if args.merge_into:
        param_keys = ("loss_fn", "pde_loss", "pde_metric", "ic_metric",
                      "lam", "lam2")

        def norm(v):
            # param columns are strings in CSV rows, floats from the walk
            try:
                return f"{float(v):g}"
            except (TypeError, ValueError):
                return str(v)

        def trial_key(r):
            return tuple(norm(r.get(k, "")) for k in param_keys)

        with open(args.merge_into) as f:
            old = list(csv.DictReader(f))
        fresh = {trial_key(r): r for r in rows}
        kept = [r for r in old if trial_key(r) not in fresh]
        print(f"merge: {len(rows)} fresh rows replace "
              f"{len(old) - len(kept)} of {len(old)} existing")
        rows = rows + [dict(r) for r in kept]
        rows.sort(key=lambda r: float(r["kl"]))
    fieldnames = sorted({k for r in rows for k in r})
    for path in filter(None, (os.path.join(args.src_dir, "grid_summary.csv"),
                              args.out)):
        with open(path, "w", newline="") as f:
            w = csv.DictWriter(f, fieldnames=fieldnames)
            w.writeheader()
            w.writerows(rows)
        print(f"wrote {len(rows)} trials -> {path}")
    print("top 5 by KL:")
    for r in rows[:5]:
        # merged rows read back from CSV carry string values
        print(f"  kl={float(r['kl']):.3f} nlpd={float(r['nlpd']):.3f} {r}")


if __name__ == "__main__":
    main()
