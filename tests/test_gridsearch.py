"""Grid search + best-model selection tests."""

import os

import numpy as np

from dmip_tpu import gridsearch
from dmip_tpu.utils.config import product_dict


def test_product_dict():
    out = list(product_dict(a=[1, 2], b=["x"]))
    assert out == [{"a": 1, "b": "x"}, {"a": 2, "b": "x"}]


def test_should_skip_rules():
    visited = []
    assert gridsearch.should_skip(
        {"pde_metric": "L1", "pde_loss": "cScoreFPE"}, visited
    )
    cfg = {"loss_fn": "DSM_PDE", "lam": 0.1, "pde_metric": "L2",
           "pde_loss": "FPE"}
    assert not gridsearch.should_skip(cfg, visited)
    assert gridsearch.should_skip(dict(cfg, lam2=99), visited)  # dedup


def test_grid_search_runs_and_tracks_best(tmp_path):
    config = {
        "src_dir": str(tmp_path),
        "model": "CDE",
        "hidden_layers": [8],
        "params": {
            "loss_fn": ["DSM_PDE"],
            "lam": [1.0, 0.1],
            "lam2": [1.0],
            "pde_loss": ["FPE"],
            "pde_metric": ["L1"],
            "model": ["CDE"],
            "ic_metric": ["L1"],
        },
    }
    calls = []

    def fake_train(model, loss_cfg, cfg, tdir, log_dir):
        calls.append(cfg["lam"])
        return {"p": cfg["lam"]}

    def fake_eval(model, params, y_test, out_dir):
        # smaller lam -> better kl
        return params["p"], 2.0 * params["p"], 3.0 * params["p"]

    out = gridsearch.grid_search(
        None, config, {"xdim": 2, "ydim": 2}, fake_train, fake_eval, {}, {}
    )
    assert calls == [1.0, 0.1]
    assert out["best_kl"][0] == 0.1
    assert out["best_kl"][1]["lam"] == 0.1
    assert out["best_nlpd"][0] == 0.2


def test_trial_dir_layouts(tmp_path):
    d = gridsearch.trial_dir(
        "root", {"pde_loss": "FPE", "pde_metric": "L1", "lam": 0.1}, "DSM_PDE"
    )
    assert d == os.path.join("root", "FPE", "DSM_PDELoss", "L1", "lam:0.1")
    d2 = gridsearch.trial_dir(
        "root",
        {"pde_loss": "cScoreFPE", "pde_metric": "L2", "ic_metric": "L1",
         "lam": 1.0, "lam2": 0.01},
        "PINNLoss",
    )
    assert "lam2:0.01" in d2 and "cScoreFPE" in d2


def test_params_from_path_roundtrip():
    p = gridsearch.get_params_from_path("FPE/PINNLoss/L1/L2/lam:0.1/lam2:0.01")
    assert p == {
        "pde_loss": "FPE", "loss_fn": "PINNLoss", "pde_metric": "L1",
        "ic_metric": "L2", "lam": 0.1, "lam2": 0.01,
    }


def test_traverse_subfolders(tmp_path):
    d1 = tmp_path / "FPE" / "PINNLoss" / "L1" / "L2" / "lam:0.1" / "lam2:1.0"
    d2 = tmp_path / "FPE" / "DSM_PDELoss" / "L1" / "lam:1.0"
    for d, kl in ((d1, 0.5), (d2, 0.2)):
        d.mkdir(parents=True)
        with open(d / "results.csv", "w") as f:
            f.write(",KL2,NLL_true,NLL_diffusion,MSE\n")
            f.write(f"0,{kl},1.0,1.5,0.3\n")
            f.write(f"1,{kl + 0.1},1.0,1.2,0.4\n")
    best = gridsearch.traverse_subfolders(str(tmp_path))
    assert abs(best["kl"][0] - 0.25) < 1e-9
    assert best["kl"][1]["loss_fn"] == "DSM_PDELoss"
    assert best["nll_diff"][1] is not None


def test_reeval_finalists_collect_and_factory_mapping(tmp_path):
    """tools/reeval_finalists: trials are collected from results trees sorted
    by selection KL, and path-recovered params rebuild a valid factory
    config (DSM_PDELoss path segment maps back to the DSM_PDE loss name)."""
    import csv
    import importlib.util
    import os
    import sys

    spec = importlib.util.spec_from_file_location(
        "reeval_finalists",
        os.path.join(os.path.dirname(__file__), "..", "tools",
                     "reeval_finalists.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    from dmip_tpu import gridsearch, train

    layouts = [
        ("FPE/PINNLoss/L1/L2/lam:0.1/lam2:0.01", 0.7),
        ("cScoreFPE/DSM_PDELoss/L2/lam:1.0", 0.3),
        ("FPE/PINNLoss/L2/L1/lam:0.001/lam2:1.0", 0.5),
    ]
    for rel, kl in layouts:
        rdir = tmp_path / rel / "results"
        rdir.mkdir(parents=True)
        with open(rdir / "results.csv", "w", newline="") as f:
            w = csv.DictWriter(f, fieldnames=["KL2", "NLL_true"])
            w.writeheader()
            w.writerow({"KL2": kl, "NLL_true": 1.0})
            w.writerow({"KL2": kl + 0.2, "NLL_true": 1.0})

    rows = mod.collect_trials(str(tmp_path))
    assert len(rows) == 3
    assert rows[0][0] < rows[1][0] < rows[2][0]  # sorted by mean KL
    assert rows[0][2]["loss_fn"] == "DSM_PDELoss"

    for _kl, _tdir, params in rows:
        factory_cfg = {
            "model": "CDE", "hidden_layers": [8, 8], **params,
            "loss_fn": params.get("loss_fn", "PINNLoss")
            .replace("DSM_PDELoss", "DSM_PDE"),
        }
        model, loss_cfg = train.get_model_from_args(
            factory_cfg, {"xdim": 3, "ydim": 23}
        )
        assert loss_cfg.name in ("PINNLoss", "DSM_PDE")
        if "lam" in params:
            assert loss_cfg.lam == params["lam"]


def test_skip_existing_reuses_results_without_wiping(tmp_path):
    """Regression: set_directories wipes the trial's results dir, so it must
    NOT run before the skip_existing reuse check — pre-fix, every resume
    deleted results.csv first and re-evaluated every completed trial."""
    config = {
        "src_dir": str(tmp_path),
        "model": "CDE",
        "hidden_layers": [8],
        "params": {
            "loss_fn": ["DSM_PDE"],
            "lam": [1.0, 0.1],
            "lam2": [1.0],
            "pde_loss": ["FPE"],
            "pde_metric": ["L1"],
            "model": ["CDE"],
            "ic_metric": ["L1"],
        },
    }

    # Pre-seed trial lam=1.0 with finished results.
    from dmip_tpu.train import get_model_from_args

    full_cfg = {**config, "loss_fn": "DSM_PDE", "lam": 1.0, "lam2": 1.0,
                "pde_loss": "FPE", "pde_metric": "L1", "model": "CDE",
                "ic_metric": "L1"}
    _, loss_cfg = get_model_from_args(full_cfg, {"xdim": 2, "ydim": 2})
    tdir = gridsearch.trial_dir(str(tmp_path), full_cfg, loss_cfg.name)
    out_dir = os.path.join(tdir, "results")
    os.makedirs(out_dir)
    path = os.path.join(out_dir, "results.csv")
    with open(path, "w") as f:
        f.write(",KL2,NLL_true,NLL_diffusion,MSE\n0,0.5,1.0,1.25,0.02\n")
    mtime = os.path.getmtime(path)

    trained, evaluated = [], []

    def fake_train(model, loss_cfg, cfg, tdir, log_dir):
        trained.append(cfg["lam"])
        return {"p": cfg["lam"]}

    def fake_eval(model, params, y_test, out_dir):
        evaluated.append(params["p"])
        return params["p"], 2.0 * params["p"], 3.0 * params["p"]

    out = gridsearch.grid_search(
        None, config, {"xdim": 2, "ydim": 2}, fake_train, fake_eval, {}, {},
        skip_existing=True,
    )
    # completed trial: untouched on disk, not retrained, not re-evaluated,
    # but its metrics feed best-tracking
    assert os.path.exists(path) and os.path.getmtime(path) == mtime
    assert trained == [0.1] and evaluated == [0.1]
    assert out["best_kl"][0] == 0.1  # fresh trial wins
    assert out["best_nlpd"][0] == 0.2
