"""Shared glue for the scatterometry experiment tools (round-4 consolidation).

Six tools (beat_snf_experiments, dps_sweep, dps_guidance_sweep,
fused_dps_sanity, reeval_finalists, refined_snf_parity — and the round-4
gt_half_swap) each carried their own copies of the same plumbing: the
problem/test-set setup keyed to RANDOM_STATE 13, the GT loader, checkpoint
resolution with the durable-archive fallback, and the refinement config
grammar.  This module is the single home for all of it.

Checkpoint resolution always PRINTS the path it resolved (round-3 advisor:
the silent archive fallback meant a results log could not show which
proposal produced a row).
"""

from __future__ import annotations

import dataclasses
import os
import sys
from typing import Callable, Sequence

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

import jax
import numpy as np

from dmip_tpu import checkpoints, data, train
from dmip_tpu.models import refined as _refined_mod
from dmip_tpu.problems import scatterometry as scat

# Every scatterometry driver (GT generator, baselines, grids, these tools)
# derives its test conditions from PRNGKey(13); split(key, n)[0] is
# n-invariant, so they all share the same y_test.
RANDOM_STATE = 13

# The best full-grid finalist (BENCHMARKS.md round 2); its 500k-epoch cosine
# retrain measured KL 0.624 / NLPD 1.17 and is the flagship refinement
# proposal.
BEST_TRIAL_DIR = os.path.join(
    "grid_search_results", "scatterometry_full",
    "cScoreFPE", "PINNLoss", "L2", "L1", "lam:0.01", "lam2:0.01",
)
BEST_TRIAL_CFG = {
    "model": "CDE", "loss_fn": "PINNLoss", "pde_loss": "cScoreFPE",
    "pde_metric": "L2", "ic_metric": "L1", "lam": 0.01, "lam2": 0.01,
    "hidden_layers": [512, 512, 512],
}


@dataclasses.dataclass(frozen=True)
class ScatSetup:
    """The shared scatterometry experiment context."""

    forward_model: Callable
    fparams: dict
    y_test: jax.Array
    score_post: Callable
    energy: Callable  # (x, ys_tiled) -> negative log posterior
    k_init: jax.Array
    k_train: jax.Array
    k_eval: jax.Array


def scat_setup(n_ys: int = 100) -> ScatSetup:
    """Load the surrogate + derive the shared test set / key schedule."""
    forward_model, fparams = scat.load_forward_model()
    key = jax.random.PRNGKey(RANDOM_STATE)
    k_data, k_init, k_train, k_eval = jax.random.split(key, 4)
    _, y_test = data.generate_dataset_scatterometry(
        k_data, forward_model, fparams["a"], fparams["b"], size=n_ys
    )
    score_post = scat.score_posterior(
        forward_model, fparams["a"], fparams["b"], fparams["lambd_bd"]
    )
    energy = lambda x, yt: scat.get_log_posterior(
        x, forward_model, fparams["a"], fparams["b"], yt, fparams["lambd_bd"]
    )
    return ScatSetup(forward_model, fparams, y_test, score_post, energy,
                     k_init, k_train, k_eval)


def gt_loader(gt_dir: str) -> Callable[[int, int], np.ndarray]:
    """Reference datasets.get_gt_samples_scatterometry: gt_dir/<i>/<j>.npy."""
    return data.gt_loader(gt_dir)


def resolve_checkpoint(
    template, candidates: Sequence[str], label: str = "checkpoint"
):
    """Load params from the first existing checkpoint dir, PRINTING which.

    ``candidates`` is an ordered list of checkpoint directories (typically a
    working-tree path first, then the durable ``benchmarks/checkpoints``
    archive — working trees under grid_search_results/ and trained_models/
    are gitignored and wiped between rounds).  Returns (params, path).
    """
    for cand in candidates:
        if cand and os.path.exists(os.path.join(cand, "manifest.json")):
            print(f"resolved {label}: {cand}", flush=True)
            return (
                checkpoints.load_checkpoint(cand, template, None)["params"],
                cand,
            )
    raise FileNotFoundError(
        f"no {label} found; tried: {[c for c in candidates if c]}"
    )


# Refinement config grammar (lives with the model; re-exported here as the
# tools' stable name).
build_refined = _refined_mod.from_config
