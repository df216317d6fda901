"""Archive the best trial of a finished grid into benchmarks/checkpoints/.

Glue between the best-model picker (dmip_tpu.gridsearch.traverse_subfolders,
the reference get_best_model.py analogue) and tools/archive_checkpoint.py:
finds the trial with the lowest mean KL under --src_dir and archives its
params-only checkpoint under the given name, recording the winning
hyper-params and metric in the manifest note.  Queueable in one line (the
winner isn't known until the grid's last trial finishes).

Usage:
    python tools/archive_best_trial.py \
        --src_dir grid_search_results/scatterometry_20k \
        --name cde_20k_best --metric kl \
        --note_prefix "best trial of the reference-fidelity 20k grid"
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dmip_tpu import gridsearch
from tools.archive_checkpoint import archive


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--src_dir", required=True)
    p.add_argument("--name", required=True)
    p.add_argument("--metric", default="kl",
                   choices=["kl", "kl_reverse", "nll_diff", "mse"])
    p.add_argument("--note_prefix", default="")
    args = p.parse_args()

    val, entry = gridsearch.traverse_subfolders(args.src_dir)[args.metric]
    if entry is None:
        raise SystemExit(f"no trial with metric {args.metric!r} under "
                         f"{args.src_dir}")
    # entry['path'] is the trial's results/ dir; the checkpoint sits beside it
    ckpt = os.path.join(os.path.dirname(entry["path"]), "checkpoint")
    params = {k: v for k, v in entry.items() if k != "path"}
    note = (f"{args.note_prefix + ': ' if args.note_prefix else ''}"
            f"{args.metric}={val:.4f}, {params}")
    out = archive(ckpt, args.name, note)
    print(f"best {args.metric}={val:.4f} at {entry['path']}")
    print(f"archived -> {out}")


if __name__ == "__main__":
    main()
