"""Hyper-parameter grid search + best-model selection.

Re-specifies reference ``model_selection.py`` (grid_search) and
``get_best_model.py`` (post-hoc results walker).  Fixes reference bugs
SURVEY.md §2.3.2 (factory arity crash) and §2.3.8 (use-before-assign in the
path parser) by construction.

The trial loop is sequential per trial like the reference (each trial is
itself fully device-parallel inside); ``grid_search`` additionally accepts a
``trial_filter`` so a multi-host deployment can round-robin trials across
hosts (trial parallelism — each host runs trials i % n_hosts == host_id).
"""

from __future__ import annotations

import csv
import os
from typing import Any, Callable, Dict, Iterable, List, Optional, Tuple

import numpy as np

from .train import get_model_from_args
from .utils.config import product_dict


def trial_dir(src_dir: str, cfg: Dict[str, Any], loss_name: str) -> str:
    """Encode trial params into the output path (model_selection.py:31-38)."""
    if loss_name == "DSM_PDE":
        return os.path.join(
            src_dir, cfg["pde_loss"], "DSM_PDELoss", cfg["pde_metric"],
            "lam:{}".format(cfg["lam"]),
        )
    return os.path.join(
        src_dir, cfg["pde_loss"], loss_name, cfg["pde_metric"],
        cfg.get("ic_metric", "L1"),
        "lam:{}".format(cfg["lam"]), "lam2:{}".format(cfg["lam2"]),
    )


def should_skip(
    cfg: Dict[str, Any], already_visited: List[Tuple[Any, Any]]
) -> bool:
    """Invalid-combo skipping + DSM_PDE dedup (model_selection.py:20-26):
    cScoreFPE has no L1 PDE-metric variant in the search, and duplicate
    DSM_PDE trials are deduped by (lam, pde_metric, pde_loss) — lam2 and
    ic_metric don't apply to DSM_PDE.

    Documented divergence from the reference: model_selection.py:23-26 keys
    by (lam, pde_metric) only, so its grid silently drops e.g. the
    (cScoreFPE, DSM_PDE, L2, lam) trial whenever the same (lam, L2) was
    already run with pde_loss=FPE.  Including pde_loss in the key runs every
    distinct DSM_PDE configuration exactly once (a reference bug fix, kept)."""
    if cfg.get("pde_metric") == "L1" and cfg.get("pde_loss") == "cScoreFPE":
        return True
    if cfg.get("loss_fn") == "DSM_PDE":
        sig = (cfg.get("lam"), cfg.get("pde_metric"), cfg.get("pde_loss"))
        if sig in already_visited:
            return True
        already_visited.append(sig)
    return False


def ensemble_signature(trial_cfg: Dict[str, Any]) -> Tuple:
    """Trials that differ only in lam/lam2 share one jaxpr structure and can
    train as a vmapped ensemble (dmip_tpu.ensemble)."""
    return tuple(
        sorted((k, repr(v)) for k, v in trial_cfg.items()
               if k not in ("lam", "lam2"))
    )


def grid_search(
    y_test,
    config: Dict[str, Any],
    forward_model_params: Dict[str, Any],
    train: Callable[..., Any],
    evaluate: Callable[..., Tuple[float, float, float]],
    train_args: Dict[str, Any],
    eval_args: Dict[str, Any],
    trial_filter: Optional[Callable[[int, Dict[str, Any]], bool]] = None,
    train_many: Optional[Callable[..., List[Any]]] = None,
    skip_existing: bool = False,
) -> Dict[str, Any]:
    """Cartesian grid over config['params']; tracks best-by-KL / NLPD /
    Fisher (score-MSE).

    ``train(model, loss_cfg, trial_config, train_dir, log_dir, **train_args)
    -> params`` and ``evaluate(model, params, y_test, out_dir, **eval_args)
    -> (kl, nlpd, fisher)`` are injected by the experiment driver, mirroring
    model_selection.py:5-64's dependency injection.

    ``train_many(model, loss_cfg, full_cfgs, train_dirs, log_dirs,
    **train_args) -> [params]``: optional trial-parallel trainer.  When
    given, trials sharing an :func:`ensemble_signature` (same structure,
    different lam/lam2) train together as one vmapped ensemble — the TPU
    replacement for the reference's sequential trial loop
    (model_selection.py:16) — and only structurally unique trials fall back
    to ``train``.  Evaluation and best-tracking are unchanged.

    ``skip_existing``: trial-level resume for long grids (the reference has
    none) — a trial whose results.csv already exists is not retrained; its
    metrics are re-read from disk for best-tracking.  Ensemble groups train
    only their missing members' group (a partially-done group retrains
    whole, then only missing trials are re-evaluated).
    """
    from .utils.config import set_directories

    already_visited: List[Tuple[Any, Any]] = []
    best = {
        "kl": (np.inf, {}),
        "nlpd": (np.inf, {}),
        "fisher": (np.inf, {}),
    }
    results = []

    # Materialize the trial list (skip rules + host filter), keeping order.
    trials: List[Tuple[Dict[str, Any], Dict[str, Any]]] = []
    for idx, trial_cfg in enumerate(product_dict(**config["params"])):
        full_cfg = {**config, **trial_cfg}
        if should_skip(full_cfg, already_visited):
            continue
        if trial_filter is not None and not trial_filter(idx, full_cfg):
            continue
        trials.append((trial_cfg, full_cfg))

    # Phase 1 (optional): train structure-sharing groups as ensembles.
    trained: Dict[int, Any] = {}
    if train_many is not None:
        groups: Dict[Tuple, List[int]] = {}
        for pos, (trial_cfg, _full) in enumerate(trials):
            groups.setdefault(ensemble_signature(trial_cfg), []).append(pos)
        for sig, poss in groups.items():
            if len(poss) < 2:
                continue
            if skip_existing:
                def _done(p):
                    tdir = trial_dir(
                        config["src_dir"], trials[p][1],
                        get_model_from_args(
                            trials[p][1], forward_model_params
                        )[1].name,
                    )
                    return (
                        os.path.exists(os.path.join(tdir, "results",
                                                    "results.csv"))
                        or os.path.exists(os.path.join(tdir, "checkpoint",
                                                       "manifest.json"))
                    )

                poss = [p for p in poss if not _done(p)]
                if not poss:
                    continue
            full_cfgs = [trials[p][1] for p in poss]
            model, loss_cfg = get_model_from_args(
                full_cfgs[0], forward_model_params
            )
            tdirs, log_dirs = [], []
            for fc in full_cfgs:
                tdir = trial_dir(config["src_dir"], fc, loss_cfg.name)
                out_dir = os.path.join(tdir, "results")
                log_dirs.append(set_directories(tdir, out_dir))
                tdirs.append(tdir)
            print("=================")
            print(f"ensemble of {len(poss)} trials: "
                  f"{[trials[p][0] for p in poss]}", flush=True)
            params_list = train_many(
                model, loss_cfg, full_cfgs, tdirs, log_dirs, **train_args
            )
            for p, params in zip(poss, params_list):
                trained[p] = params

    # Phase 2: per-trial (train when not ensemble-trained) + evaluate.
    for pos, (trial_cfg, full_cfg) in enumerate(trials):
        model, loss_cfg = get_model_from_args(full_cfg, forward_model_params)
        tdir = trial_dir(config["src_dir"], full_cfg, loss_cfg.name)
        out_dir = os.path.join(tdir, "results")
        print("-----------------")
        print(trial_cfg, flush=True)

        existing = os.path.join(out_dir, "results.csv")
        if skip_existing and os.path.exists(existing):
            # Directories must NOT be touched on this branch:
            # set_directories WIPES out_dir, which would delete the very
            # results being reused (and turn trial-level resume into a full
            # re-evaluation of every completed trial).
            cols = _read_results_csv(existing)
            kl = float(np.mean(cols["KL2"]))
            nll_true_col = next(
                (c for c in ("NLL_true", "NLL_mcmc") if c in cols), None
            )
            nlpd = (
                float(np.mean(np.abs(
                    cols["NLL_diffusion"] - cols[nll_true_col]
                )))
                if nll_true_col and "NLL_diffusion" in cols else np.inf
            )
            fisher = float(np.mean(cols["MSE"])) if "MSE" in cols else np.inf
            print(f"(existing results reused: KL={kl:.4f})", flush=True)
        else:
            log_dir = set_directories(tdir, out_dir)
            ckpt_dir = os.path.join(tdir, "checkpoint")
            if pos in trained:
                params = trained[pos]
            elif skip_existing and os.path.exists(
                os.path.join(ckpt_dir, "manifest.json")
            ):
                # crash-resume: a prior run trained this trial (per-trial
                # checkpoints from ensemble training) but died before eval
                import jax as _jax

                from . import checkpoints as _ckpt

                params = _ckpt.load_checkpoint(
                    ckpt_dir, model.init(_jax.random.PRNGKey(0)), None
                )["params"]
                print("(checkpoint reused, eval only)", flush=True)
            else:
                params = train(
                    model, loss_cfg, full_cfg, tdir, log_dir, **train_args
                )
            kl, nlpd, fisher = evaluate(
                model, params, y_test, out_dir, **eval_args
            )
        results.append({**trial_cfg, "kl": kl, "nlpd": nlpd, "fisher": fisher})

        for metric, val in (("kl", kl), ("nlpd", nlpd), ("fisher", fisher)):
            if val < best[metric][0]:
                best[metric] = (val, trial_cfg)

        print("---------------------------------")
        for metric, label in (
            ("kl", "Best KL"), ("nlpd", "Best NLPD"),
            ("fisher", "Best Fisher divergence"),
        ):
            print(f"{label}: ", best[metric][0])
            print(best[metric][1])
            print("-------------------", flush=True)

    # One-file summary of the whole grid (one row per trial), written at the
    # tree root so results survive as a single committable artifact even
    # though the per-trial trees are large / gitignored.
    if results:
        os.makedirs(config["src_dir"], exist_ok=True)
        fieldnames = list(results[0].keys())
        with open(
            os.path.join(config["src_dir"], "grid_summary.csv"), "w",
            newline="",
        ) as f:
            w = csv.DictWriter(f, fieldnames=fieldnames)
            w.writeheader()
            w.writerows(results)

    return {
        "best_kl": best["kl"], "best_nlpd": best["nlpd"],
        "best_fisher": best["fisher"], "results": results,
    }


# ---------------------------------------------------------------------------
# Post-hoc best-model picker (reference get_best_model.py)
# ---------------------------------------------------------------------------


def get_params_from_path(path: str) -> Dict[str, Any]:
    """Recover hyper-params from a trial directory path.

    Handles both layouts produced by :func:`trial_dir`.  Fixes reference bug
    SURVEY.md §2.3.8 (use-before-assign when the experiment name is absent).
    """
    parts = path.replace("\\", "/").split("/")
    out: Dict[str, Any] = {}
    for p in parts:
        if p in ("FPE", "cScoreFPE"):
            out["pde_loss"] = p
        elif p in ("PINNLoss", "PINNLoss2", "DSM_PDELoss"):
            out["loss_fn"] = p
        elif p.startswith("lam:"):
            out["lam"] = float(p[4:])
        elif p.startswith("lam2:"):
            out["lam2"] = float(p[5:])
        elif p in ("L1", "L2"):
            # first metric seen is pde_metric, second is ic_metric
            if "pde_metric" not in out:
                out["pde_metric"] = p
            else:
                out["ic_metric"] = p
    return out


def _read_results_csv(path: str) -> Dict[str, np.ndarray]:
    with open(path) as f:
        reader = csv.DictReader(f)
        cols: Dict[str, List[float]] = {}
        for row in reader:
            for k, v in row.items():
                if k in ("", None):
                    continue
                cols.setdefault(k, []).append(float(v))
    return {k: np.asarray(v) for k, v in cols.items()}


def traverse_subfolders(
    src_dir: str, exclude: Iterable[str] = ()
) -> Dict[str, Any]:
    """Walk a grid-search results tree and report the best trials.

    Mirrors get_best_model.py:21-126: reads each results.csv, recovers
    params from the path, ranks by mean KL / reverse KL / NLL-diff / MSE.
    """
    best = {
        "kl": (np.inf, None), "kl_reverse": (np.inf, None),
        "nll_diff": (np.inf, None), "mse": (np.inf, None),
    }
    for root, _dirs, files in os.walk(src_dir):
        if any(e and e in root for e in exclude):
            continue
        if "results.csv" not in files:
            continue
        cols = _read_results_csv(os.path.join(root, "results.csv"))
        params = get_params_from_path(os.path.relpath(root, src_dir))
        entry = {"path": root, **params}
        if "KL2" in cols:
            m = float(np.mean(cols["KL2"]))
            if m < best["kl"][0]:
                best["kl"] = (m, entry)
        if "KL_reverse" in cols:
            m = float(np.mean(cols["KL_reverse"]))
            if m < best["kl_reverse"][0]:
                best["kl_reverse"] = (m, entry)
        nll_true_col = next(
            (c for c in ("NLL_true", "NLL_mcmc") if c in cols), None
        )
        if nll_true_col and "NLL_diffusion" in cols:
            m = float(np.mean(np.abs(cols["NLL_diffusion"] - cols[nll_true_col])))
            if m < best["nll_diff"][0]:
                best["nll_diff"] = (m, entry)
        if "MSE" in cols:
            m = float(np.mean(cols["MSE"]))
            if m < best["mse"][0]:
                best["mse"] = (m, entry)
    return best


def main():  # pragma: no cover
    """CLI mirroring get_best_model.py:100-126."""
    import argparse

    p = argparse.ArgumentParser()
    p.add_argument("--src_dir", required=True)
    p.add_argument("--exclude", default="", help="comma-separated substrings")
    args = p.parse_args()
    best = traverse_subfolders(args.src_dir, args.exclude.split(","))
    for metric, (val, entry) in best.items():
        print(f"best {metric}: {val}")
        print(f"  {entry}")


if __name__ == "__main__":  # pragma: no cover
    main()
