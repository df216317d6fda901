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


def test_main_diffusion_linear_refined_row(tmp_path):
    """The 'refine:' config key produces the energy-refined companion row
    (round-4 verdict #6: the refinement abstraction wired to the linear
    problem's exact analytic energy)."""
    import main_diffusion_linear as m

    cfg = _linear_cfg(tmp_path, refine="mh,5,0.2", plot_ys=[])
    _, (kl, nlpd, mse) = m.run(cfg)
    assert np.isfinite(kl)
    refined_csv = tmp_path / "out_refined_mh5_0.2" / "results.csv"
    assert os.path.exists(refined_csv)
    import csv

    with open(refined_csv) as f:
        rows = list(csv.DictReader(f))
    assert len(rows) == 2  # n_samples_y conditions
    assert all(np.isfinite(float(r["KL2"])) for r in rows)


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


def test_main_diffusion_scatterometry_refined_cosine(tmp_path):
    """The flagship recipe's config surface (config_scatterometry_refined.yml
    at toy scale): cosine lr schedule + energy-refined evaluation through the
    driver, writing a second results.csv into out_dir + '_refined'."""
    import generate_scatterometry_ground_truth as gt
    import main_diffusion_scatterometry as m

    gt_cfg = dict(
        RANDOM_STATE=13, n_samples_y=2, n_samples_x=500, METR_STEPS=50,
        NOISE_STD_MCMC=0.5, n_repeats=2, plot_ys=[],
    )
    gt_dir = str(tmp_path / "gt")
    gt.run(gt_cfg, gt_dir, plot=False)

    cfg = dict(
        RANDOM_STATE=13, n_epochs=6, n_samples_y=2, n_samples_x=500,
        batch_size=100, resume_training=False, model="CDE", loss_fn="DSM",
        lam=0.01, lam2=0.001, pde_loss="FPE", pde_metric="L1", ic_metric="L2",
        train_dir=str(tmp_path / "train"), out_dir=str(tmp_path / "out"),
        lr=1e-3, lr_schedule="cosine", lr_min_ratio=0.01,
        hidden_layers=[32, 32], plot_ys=[], epochs_per_call=3, n_repeats=2,
        # string grammar exercises the round-4 annealed-chain path
        # (mh,3,0.1 with lam 0.5 -> 1) through models/refined.from_config
        refine="mh,3,0.1,anneal=0.5",
    )
    params, (kl, nlpd, mse) = m.run(cfg, gt_dir)
    assert np.isfinite(kl) and np.isfinite(nlpd) and np.isfinite(mse)
    assert os.path.exists(tmp_path / "out" / "results.csv")
    assert os.path.exists(tmp_path / "out_refined" / "results.csv")
    import csv

    with open(tmp_path / "out_refined" / "results.csv") as f:
        rows = list(csv.DictReader(f))
    assert rows and np.isfinite(float(rows[0]["KL2"]))


def test_build_optimizer_schedules():
    from dmip_tpu import train

    train.build_optimizer(1e-4, schedule="cosine", decay_steps=100)
    train.build_optimizer(1e-4, None, "constant")
    with pytest.raises(ValueError):
        train.build_optimizer(1e-4, schedule="cosine")  # no decay_steps
    with pytest.raises(ValueError):
        train.build_optimizer(1e-4, schedule="warmup_exp")


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


def test_gt_generator_sharded_chains(tmp_path):
    """The GT generator's --devices path: chains shard over an 8-device mesh
    via shard_map (per-device keys), and the pooled samples match the
    single-device run statistically (same annealed posterior)."""
    import jax
    import generate_scatterometry_ground_truth as gt
    from dmip_tpu.parallel.mesh import get_mesh
    from dmip_tpu.problems import scatterometry as scat

    forward_model, fparams = scat.load_forward_model()
    key = jax.random.PRNGKey(5)
    _, y = __import__("dmip_tpu").data.generate_dataset_scatterometry(
        key, forward_model, fparams["a"], fparams["b"], size=1
    )

    k1 = jax.random.PRNGKey(11)
    single = gt.make_gt_kernel(
        forward_model, fparams, n_chains=2048, metr_steps=120,
        noise_std=0.5, backend="xla",
    )
    x1 = np.asarray(single(k1, y[0]))

    sharded = gt.make_gt_kernel(
        forward_model, fparams, n_chains=2048, metr_steps=120,
        noise_std=0.5, backend="xla", mesh=get_mesh(8),
    )
    x8 = np.asarray(sharded(k1, y[0]))

    assert x8.shape == (2048, 3)
    assert np.all(np.isfinite(x8))
    # Different RNG layout -> different draws, same target distribution.
    np.testing.assert_allclose(x1.mean(0), x8.mean(0), atol=0.1)
    np.testing.assert_allclose(x1.std(0), x8.std(0), atol=0.1)
    # per-device shards are genuinely distinct chains, not copies
    blocks = x8.reshape(8, 256, 3)
    assert not np.allclose(blocks[0], blocks[1])


def test_gt_generator_devices_flag(tmp_path):
    """run(..., devices=-1) writes per-repeat GT files through the sharded
    kernel."""
    import generate_scatterometry_ground_truth as gt

    cfg = dict(
        RANDOM_STATE=13, n_samples_y=1, n_samples_x=512, METR_STEPS=30,
        NOISE_STD_MCMC=0.5, n_repeats=2, plot_ys=[],
    )
    gt_dir = str(tmp_path / "gt8")
    gt.run(cfg, gt_dir, plot=False, devices=-1)
    a = np.load(os.path.join(gt_dir, "0", "0.npy"))
    b = np.load(os.path.join(gt_dir, "0", "1.npy"))
    assert a.shape == (512, 3) and b.shape == (512, 3)
    assert np.all(np.isfinite(a)) and not np.allclose(a, b)


def test_main_baselines_scatterometry_e2e_and_eval_only(tmp_path):
    """The three-baseline driver at toy scale, then the eval_only re-score
    path from its saved checkpoints (W2 columns included)."""
    import csv

    import main_baselines_scatterometry as m

    gt_dir = tmp_path / "gt"
    rng = np.random.default_rng(0)
    for i in range(2):
        os.makedirs(gt_dir / str(i))
        for j in range(2):
            np.save(gt_dir / str(i) / f"{j}.npy",
                    rng.uniform(-1, 1, size=(300, 3)).astype(np.float32))
    cfg = dict(
        n_samples_y=2, n_samples_x=300, lr=1e-3, lr_INN=1e-3,
        RANDOM_STATE=13, n_epochs_dsm=4, n_epochs_SNF=2, n_epochs_INN=2,
        plot_ys=[], train_dir=str(tmp_path / "train"),
        out_dir=str(tmp_path / "out"), model="CDE", num_layers_INN=2,
        size_hidden_layers_INN=16, metr_steps_per_block=2, noise_std=0.4,
        batch_size=100, hidden_layers=[16, 16], n_repeats=2,
    )
    mean = m.run(cfg, str(gt_dir))
    for k in ("KL_SNF", "KL_diffusion", "KL_INN",
              "W2_SNF", "W2_diffusion", "W2_INN"):
        assert np.isfinite(mean[k]), k
    with open(tmp_path / "out" / "results.csv") as f:
        header = next(csv.reader(f))
    assert "W2_SNF" in header and "W2_INN" in header

    # eval_only must not wipe the training run's logs or the previous
    # results (set_directories is skipped on that path)
    log_file = tmp_path / "train" / "logs" / "events.jsonl"
    assert log_file.exists()
    log_bytes = log_file.stat().st_size

    mean2 = m.run(cfg, str(gt_dir), eval_only=True)
    # same checkpoints + same eval key schedule -> identical numbers
    for k in mean:
        np.testing.assert_allclose(mean2[k], mean[k], rtol=1e-5, err_msg=k)
    assert log_file.exists() and log_file.stat().st_size == log_bytes


def test_main_diffusion_linear_fused_backend(tmp_path):
    """train_backend: fused_pallas runs the whole main e2e (interpret mode
    on the CPU test platform) and lands near the XLA backend's trained
    params.  The tolerance is bf16-matmul scale: the backend keeps its
    product compute dtype (bf16, what runs on TPU) while CPU XLA computes
    f32; exact parity at matched dtype is covered by
    tests/test_dsm_train_kernel.py."""
    import jax
    import numpy as np

    import main_diffusion_linear as m

    small = dict(n_samples_x=500, dataset_size=900, batch_size=100,
                 n_epochs=4, epochs_per_call=2, plot_ys=[], n_repeats=1)
    cfg_x = _linear_cfg(tmp_path / "xla", **small)
    # mesh=None: the test platform exposes 8 virtual devices, so 'auto'
    # would resolve to a mesh the fused (single-device) backend rejects
    cfg_f = _linear_cfg(tmp_path / "fused", train_backend="fused_pallas",
                        mesh=None, **small)
    params_x, metrics_x = m.run(cfg_x)
    params_f, metrics_f = m.run(cfg_f)
    assert np.isfinite(metrics_f[0])
    d = max(
        float(jax.numpy.max(jax.numpy.abs(a - b)))
        for a, b in zip(jax.tree_util.tree_leaves(params_x),
                        jax.tree_util.tree_leaves(params_f))
    )
    assert d < 2e-2, f"fused-vs-xla param drift {d}"


def test_select_epoch_fn_rejects_invalid_fused_configs():
    """The fused backend refuses non-DSM / scheduled / clipped configs with
    the reason, instead of silently falling back."""
    import optax
    import pytest as _pytest

    from dmip_tpu.train import get_model_from_args, select_epoch_fn

    model, cfg = get_model_from_args(
        {"model": "CDE", "loss_fn": "DSM", "hidden_layers": [8]},
        {"xdim": 2, "ydim": 2},
    )
    loss_fn = model.make_loss_fn(cfg)
    opt = optax.adam(1e-3)
    bad = [
        ({"loss_fn": "PINNLoss", "model": "CDE", "mesh": None}, "loss_fn"),
        ({"loss_fn": "DSM", "model": "Posterior", "mesh": None}, "model"),
        ({"loss_fn": "DSM", "model": "CDE", "mesh": None,
          "grad_clip": 1.0}, "grad_clip"),
        ({"loss_fn": "DSM", "model": "CDE", "mesh": None,
          "lr_schedule": "cosine"}, "lr_schedule"),
        ({"loss_fn": "DSM", "model": "CDE", "mesh": "auto"}, "mesh"),
    ]
    for over, key in bad:
        config = {"train_backend": "fused_pallas", "lr": 1e-3, **over}
        with _pytest.raises(ValueError, match="fused_pallas"):
            select_epoch_fn(config, model, loss_fn, opt, lambda k: None, 2)
    with _pytest.raises(ValueError, match="unknown train_backend"):
        select_epoch_fn({"train_backend": "nope"}, model, loss_fn, opt,
                        lambda k: None, 2)
