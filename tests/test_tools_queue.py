"""Queue glue tools: tools/archive_best_trial.py picks + archives the
grid winner; tools/refined_snf_parity.py's report-only paired mode
(--paired_tags) tolerates a missing probe CSV (so one failed probe can't
abort the whole paired report in the TPU queue)."""

import csv
import json
import os
import sys

import jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from dmip_tpu import checkpoints
from tools import archive_checkpoint


def _write_trial(root, pde_loss, lam, kl_values, w):
    tdir = root / pde_loss / "PINNLoss" / "L2" / "L1" / f"lam:{lam}" / "lam2:0.01"
    (tdir / "results").mkdir(parents=True)
    with open(tdir / "results" / "results.csv", "w", newline="") as f:
        wr = csv.DictWriter(f, fieldnames=["", "KL2"])
        wr.writeheader()
        for i, v in enumerate(kl_values):
            wr.writerow({"": i, "KL2": v})
    checkpoints.save_checkpoint(
        str(tdir / "checkpoint"), {"w": jnp.full((2, 2), w)}, step=7
    )
    return tdir


def test_archive_best_trial_picks_min_kl(tmp_path, monkeypatch):
    monkeypatch.setattr(archive_checkpoint, "ARCHIVE", str(tmp_path / "arch"))
    grid = tmp_path / "grid"
    _write_trial(grid, "FPE", 0.1, [2.0, 2.2], w=1.0)
    best = _write_trial(grid, "cScoreFPE", 0.01, [0.5, 0.7], w=9.0)

    monkeypatch.setattr(sys, "argv", [
        "archive_best_trial.py", "--src_dir", str(grid),
        "--name", "unit_best", "--note_prefix", "unit grid",
    ])
    from tools import archive_best_trial
    archive_best_trial.main()

    out = tmp_path / "arch" / "unit_best"
    with open(out / "manifest.json") as f:
        manifest = json.load(f)
    # the winner (mean KL 0.6) and its recovered hyper-params in the note
    assert "kl=0.6000" in manifest["note"]
    assert "cScoreFPE" in manifest["note"] and "unit grid" in manifest["note"]
    loaded = checkpoints.load_checkpoint(
        str(out), params_like={"w": jnp.zeros((2, 2))}
    )
    assert float(loaded["params"]["w"][0, 0]) == 9.0
    assert str(best / "checkpoint").endswith(
        manifest["archived_from"].split("grid/")[-1]
    ) or "checkpoint" in manifest["archived_from"]


def test_paired_report_tolerates_missing_probe_csv(tmp_path, monkeypatch, capsys):
    from tools import refined_snf_parity as rsp

    # synthetic baselines CSV (the SNF side of every pairing)
    bdir = tmp_path / "results" / "scatterometry" / "baselines"
    bdir.mkdir(parents=True)
    with open(bdir / "results.csv", "w", newline="") as f:
        wr = csv.DictWriter(
            f, fieldnames=["KL_SNF", "NLL_snf", "NLL_mcmc", "W2_SNF"]
        )
        wr.writeheader()
        for i in range(5):
            wr.writerow({"KL_SNF": 0.5 + 0.01 * i, "NLL_snf": 1.0,
                         "NLL_mcmc": 0.4, "W2_SNF": 0.09})
    # one existing probe CSV, one missing
    rdir = tmp_path / "results" / "scatterometry_refined_mh3_0.1"
    rdir.mkdir(parents=True)
    with open(rdir / "results.csv", "w", newline="") as f:
        wr = csv.DictWriter(
            f, fieldnames=["KL2", "NLL_diffusion", "NLL_mcmc", "W2"]
        )
        wr.writeheader()
        for i in range(5):
            wr.writerow({"KL2": 0.58 + 0.01 * i, "NLL_diffusion": 0.8,
                         "NLL_mcmc": 0.4, "W2": 0.02})

    monkeypatch.chdir(tmp_path)
    monkeypatch.setattr(
        rsp, "BASELINES_CSV",
        os.path.join("results", "scatterometry", "baselines", "results.csv"),
    )
    rsp.paired_report("mh3_0.1")      # exists -> full stats
    rsp.paired_report("mh99_0.0")     # missing -> warn + continue
    out = capsys.readouterr().out
    assert "refined:mh3_0.1" in out and "paired diff" in out
    assert "skipped" in out and "mh99_0.0" in out
