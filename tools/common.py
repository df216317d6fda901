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
from dmip_tpu.models import EnergyRefinedModel
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
    return lambda i, j: np.load(os.path.join(gt_dir, str(i), f"{j}.npy"))


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


def build_refined(model, energy, cfg_str: str):
    """Refinement config grammar -> (model, tag).

    ``'kernel,steps,param[,frac[,tau]][,key=value...]'`` — kernel mh/mala/
    ula/none, param = noise_std (mh) or stepsize (mala/ula); positional
    frac<1 = partial-refinement mixture, tau>0 = one final ULA smoothing
    step (both measured-negative probes, BENCHMARKS.md).  Named options:
    ``anneal=L`` starts the MH chain at interpolated-energy lambda=L
    (SNF's schedule, mcmc.annealed_mh), ``acc=A`` adapts the proposal std
    toward mean acceptance A per condition.
    """
    parts = cfg_str.split(",")
    named = {}
    positional = []
    for p in parts[3:]:
        if "=" in p:
            k, v = p.split("=", 1)
            named[k] = float(v)
        else:
            positional.append(p)
    kernel, steps, param = parts[0], int(parts[1]), parts[2]
    frac = float(positional[0]) if len(positional) > 0 else 1.0
    tau = float(positional[1]) if len(positional) > 1 else 0.0
    anneal = named.pop("anneal", 1.0)
    acc = named.pop("acc", 0.0)
    if named:
        raise ValueError(f"unknown refinement options: {sorted(named)}")
    if (kernel == "none" or steps == 0) and tau == 0.0:
        return model, "cde"
    if kernel == "none" or steps == 0:
        refined = EnergyRefinedModel(model, energy, refine_steps=0,
                                     smooth_tau=tau)
        return refined, f"cde_tau{tau}"
    kw = ({"noise_std": float(param)} if kernel == "mh"
          else {"stepsize": float(param)})
    refined = EnergyRefinedModel(model, energy, refine_steps=steps,
                                 kernel=kernel, refine_frac=frac,
                                 smooth_tau=tau, anneal_from=anneal,
                                 target_acc=acc, **kw)
    tag = (f"{kernel}{steps}_{param}"
           + (f"_f{frac}" if frac < 1.0 else "")
           + (f"_tau{tau}" if tau > 0.0 else "")
           + (f"_a{anneal}" if anneal < 1.0 else "")
           + (f"_acc{acc}" if acc > 0.0 else ""))
    return refined, tag
