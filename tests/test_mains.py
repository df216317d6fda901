"""End-to-end driver tests with tiny configs (CPU, minutes-scale).

These run the actual mains/ entry points — config load, factory, training,
checkpointing, evaluation, results.csv/plots — at toy scale.
"""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "mains"))


def _linear_cfg(tmp_path, **over):
    cfg = dict(
        n_samples_y=2, n_samples_x=2000, dataset_size=5000, train_size=0.9,
        random_state=7, lr=1e-3, resume_training=False, n_repeats=2,
        n_epochs=10, model="CDE", loss_fn="DSM", lam=0.001, lam2=0.1,
        pde_loss="FPE", pde_metric="L1", ic_metric="L2",
        train_dir=str(tmp_path / "train"), out_dir=str(tmp_path / "out"),
        batch_size=500, plot_ys=[0], hidden_layers=[32, 32],
        epochs_per_call=5,
    )
    cfg.update(over)
    return cfg


def test_main_diffusion_linear_e2e(tmp_path):
    import main_diffusion_linear as m

    cfg = _linear_cfg(tmp_path)
    params, (kl, nlpd, mse) = m.run(cfg)
    assert np.isfinite(kl) and np.isfinite(nlpd) and np.isfinite(mse)
    assert os.path.exists(tmp_path / "out" / "results.csv")
    assert os.path.exists(tmp_path / "train" / "checkpoint" / "manifest.json")
    assert os.path.exists(tmp_path / "out" / "posterior-diffusion-0.svg")

    # resume path: restores checkpoint and continues without error
    cfg2 = _linear_cfg(tmp_path, resume_training=True, n_epochs=12)
    params2, metrics2 = m.run(cfg2)
    assert np.isfinite(metrics2[0])


def test_main_diffusion_scatterometry_e2e(tmp_path):
    import jax
    import generate_scatterometry_ground_truth as gt
    import main_diffusion_scatterometry as m

    gt_cfg = dict(
        RANDOM_STATE=13, n_samples_y=2, n_samples_x=500, METR_STEPS=50,
        NOISE_STD_MCMC=0.5, n_repeats=2, plot_ys=[],
    )
    gt_dir = str(tmp_path / "gt")
    gt.run(gt_cfg, gt_dir, plot=False)
    assert os.path.exists(os.path.join(gt_dir, "1", "1.npy"))

    cfg = dict(
        RANDOM_STATE=13, n_epochs=6, n_samples_y=2, n_samples_x=500,
        batch_size=100, resume_training=False, model="CDE", loss_fn="DSM",
        lam=0.01, lam2=0.001, pde_loss="FPE", pde_metric="L1", ic_metric="L2",
        train_dir=str(tmp_path / "train"), out_dir=str(tmp_path / "out"),
        lr=1e-3, hidden_layers=[32, 32], plot_ys=[], epochs_per_call=3,
        n_repeats=2,
    )
    params, (kl, nlpd, mse) = m.run(cfg, gt_dir)
    assert np.isfinite(kl) and np.isfinite(nlpd) and np.isfinite(mse)
    assert os.path.exists(tmp_path / "out" / "results.csv")


def test_run_grid_search_linear_tiny(tmp_path, monkeypatch):
    """Grid search driver end-to-end over 2 trials."""
    import jax
    import optax

    from dmip_tpu import data, evaluate, gridsearch, train
    from dmip_tpu.problems import LinearForwardProblem

    prob = LinearForwardProblem()
    key = jax.random.PRNGKey(0)
    xs, ys = data.generate_dataset_linear(key, 2, prob.forward, 3000)
    x_tr, x_te, y_tr, y_te = data.train_test_split(key, xs, ys, 0.9)
    config = dict(
        lr=1e-3, hidden_layers=[16, 16], n_epochs=4, n_samples_y=2,
        n_samples_x=1000, batch_size=500, src_dir=str(tmp_path),
        plot_ys=[],
        params={
            "loss_fn": ["PINNLoss"], "lam": [1.0, 0.1], "lam2": [1.0],
            "pde_loss": ["cScoreFPE"], "pde_metric": ["L2"],
            "model": ["CDE"], "ic_metric": ["L1"],
        },
    )

    def train_fn(model, loss_cfg, trial_cfg, tdir, log_dir):
        loss_fn = model.make_loss_fn(
            loss_cfg, initial_condition=prob.score_posterior
        )
        params = model.init(key)
        opt = optax.adam(1e-3)
        epoch_fn = train.make_epoch_fn(
            loss_fn, opt,
            lambda k: data.linear_epoch_batches(k, x_tr, y_tr, prob.scale, 500),
            epochs_per_call=2,
        )
        params, _, _ = train.fit(
            epoch_fn, params, opt, key, num_epochs=4, epochs_per_call=2,
            log_every=0,
        )
        return params

    def eval_fn(model, params, y_eval, out_dir):
        return evaluate.evaluate_linear(
            model, params, prob, y_eval, key, out_dir=out_dir,
            n_samples_x=1000, n_repeats=1, num_steps=20, verbose=False,
        )

    out = gridsearch.grid_search(
        y_te[:2], config, {"xdim": 2, "ydim": 2}, train_fn, eval_fn, {}, {}
    )
    assert len(out["results"]) == 2
    assert np.isfinite(out["best_kl"][0])
    # results trees written
    best = gridsearch.traverse_subfolders(str(tmp_path))
    assert best["kl"][1] is not None
