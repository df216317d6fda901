"""One-command GT-vs-GT metric-floor measurement (round-2 hygiene item).

Scores disjoint halves of the scatterometry ground-truth MCMC repeats
against each other under the reference's own histogram-KL protocol (plus
sliced-W2) via :func:`dmip_tpu.evaluate.gt_floor_scatterometry`.  TRUE
posterior samples do not score 0 on the sparse 75^3 histogram KL — the
floor this prints is the resolution limit any model KL must be read
against (BENCHMARKS.md "metric floor").

Usage: PYTHONPATH=. python tools/gt_floor.py \
          [--gt_dir data/gt_samples_scatterometry] [--n_conditions 100]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

# histogram/sort work only — pin to CPU so the floor can be measured while
# the TPU runs training (the sitecustomize axon plugin wins over env alone)
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

from dmip_tpu.evaluate import gt_floor_scatterometry  # noqa: E402


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--gt_dir", default="data/gt_samples_scatterometry")
    p.add_argument("--n_conditions", type=int, default=100)
    p.add_argument("--n_repeats", type=int, default=10)
    p.add_argument("--nbins", type=int, default=75)
    args = p.parse_args()

    out = gt_floor_scatterometry(
        lambda i, j: np.load(os.path.join(args.gt_dir, str(i), f"{j}.npy")),
        n_conditions=args.n_conditions, n_repeats=args.n_repeats,
        nbins=args.nbins,
    )
    for name, v in out.items():
        print(f"{name}: mean {v.mean():.4f} +- {v.std():.4f} "
              f"(range {v.min():.4f}-{v.max():.4f})", flush=True)


if __name__ == "__main__":
    main()
