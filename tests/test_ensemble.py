"""Trial-parallel (ensemble) grid-search training tests.

VERDICT r1 #3: trials sharing a jaxpr structure (same loss/metrics,
different lam/lam2) train as one vmapped, mesh-sharded program; per-trial
results must match sequential runs.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from dmip_tpu import data, ensemble, train
from dmip_tpu.models import LossConfig
from dmip_tpu.parallel.mesh import get_mesh
from dmip_tpu.problems import LinearForwardProblem


@pytest.fixture(scope="module")
def setup():
    key = jax.random.PRNGKey(0)
    prob = LinearForwardProblem()
    xs, ys = data.generate_dataset_linear(key, 2, prob.forward, 4000)
    model, cfg = train.get_model_from_args(
        {"model": "CDE", "loss_fn": "PINNLoss", "lam": 0.0, "lam2": 0.0,
         "hidden_layers": [16, 16], "pde_loss": "FPE", "pde_metric": "L1",
         "ic_metric": "L1"},
        {"xdim": 2, "ydim": 2},
    )
    batch_fn = lambda k: data.linear_epoch_batches(
        k, xs, ys, prob.noise_std, 500
    )
    return prob, model, cfg, batch_fn


def _sequential_run(prob, model, cfg, batch_fn, lam, lam2, n_epochs, epc):
    import dataclasses

    cfg_i = dataclasses.replace(cfg, lam=lam, lam2=lam2)
    loss_fn = model.make_loss_fn(cfg_i, initial_condition=prob.score_posterior)
    opt = optax.adam(1e-3)
    epoch_fn = train.make_epoch_fn(loss_fn, opt, batch_fn,
                                   epochs_per_call=epc, donate=False)
    params, _, _ = train.fit(
        epoch_fn, model.init(jax.random.PRNGKey(1)), opt,
        jax.random.PRNGKey(2), num_epochs=n_epochs, epochs_per_call=epc,
        log_every=0,
    )
    return params


def test_ensemble_matches_sequential_trials(setup):
    """Each ensemble trial's parameters equal the sequential run with the
    same lam/lam2 (same init, key schedule, batches)."""
    prob, model, cfg, batch_fn = setup
    lams = [0.5, 0.05, 1.0]
    lam2s = [1.0, 0.1, 0.3]
    n_epochs, epc = 4, 2

    opt = optax.adam(1e-3)
    epoch_fn = ensemble.make_ensemble_epoch_fn(
        model, cfg, opt, batch_fn, epochs_per_call=epc,
        loss_kwargs={"initial_condition": prob.score_posterior},
        donate=False,
    )
    ens = ensemble.init_ensemble(model, jax.random.PRNGKey(1), 3)
    ens, hist = ensemble.ensemble_fit(
        epoch_fn, ens, opt, jax.random.PRNGKey(2), n_epochs,
        jnp.asarray(lams), jnp.asarray(lam2s), epochs_per_call=epc,
        log_every=0,
    )
    assert hist.shape == (n_epochs, 3)

    for i, (lam, lam2) in enumerate(zip(lams, lam2s)):
        p_seq = _sequential_run(prob, model, cfg, batch_fn, lam, lam2,
                                n_epochs, epc)
        p_ens = ensemble.trial_params(ens, i)
        for a, b in zip(jax.tree_util.tree_leaves(p_seq),
                        jax.tree_util.tree_leaves(p_ens)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=2e-5)


def test_ensemble_sharded_matches_unsharded(setup):
    """The trial axis sharded over 8 devices gives the same parameters as
    the single-device vmap (padding to the mesh size included)."""
    prob, model, cfg, batch_fn = setup
    lams, lam2s, n_valid = ensemble.pad_trials([0.5, 0.05, 1.0],
                                               [1.0, 0.1, 0.3], 8)
    assert lams.shape == (8,) and n_valid == 3
    opt = optax.adam(1e-3)
    kwargs = dict(
        epochs_per_call=2,
        loss_kwargs={"initial_condition": prob.score_posterior},
        donate=False,
    )

    ens0 = ensemble.init_ensemble(model, jax.random.PRNGKey(1), 8)
    plain_fn = ensemble.make_ensemble_epoch_fn(model, cfg, opt, batch_fn,
                                               **kwargs)
    p_plain, _ = ensemble.ensemble_fit(
        plain_fn, ens0, opt, jax.random.PRNGKey(2), 4, lams, lam2s,
        epochs_per_call=2, log_every=0,
    )

    mesh = get_mesh(8)
    shard_fn = ensemble.make_ensemble_epoch_fn(model, cfg, opt, batch_fn,
                                               mesh=mesh, **kwargs)
    p_shard, _ = ensemble.ensemble_fit(
        shard_fn, ens0, opt, jax.random.PRNGKey(2), 4, lams, lam2s,
        epochs_per_call=2, log_every=0, mesh=mesh,
    )
    for a, b in zip(jax.tree_util.tree_leaves(p_plain),
                    jax.tree_util.tree_leaves(p_shard)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_grid_search_with_train_many(tmp_path):
    """grid_search(train_many=...) groups same-structure trials, trains the
    ensemble once, and produces the same results as sequential grid search."""
    from dmip_tpu import evaluate, gridsearch

    prob = LinearForwardProblem()
    key = jax.random.PRNGKey(0)
    xs, ys = data.generate_dataset_linear(key, 2, prob.forward, 3000)
    k_init, k_train, k_eval = jax.random.split(key, 3)
    batch_fn = lambda k: data.linear_epoch_batches(k, xs, ys, prob.noise_std,
                                                   500)

    def config(src):
        return dict(
            lr=1e-3, hidden_layers=[16, 16], n_epochs=4, batch_size=500,
            src_dir=str(tmp_path / src),
            params={
                "loss_fn": ["PINNLoss"], "lam": [1.0, 0.1], "lam2": [0.5],
                "pde_loss": ["FPE"], "pde_metric": ["L2"],
                "model": ["CDE"], "ic_metric": ["L1"],
            },
        )

    calls = {"train": 0, "train_many": 0}

    def train_fn(model, loss_cfg, trial_cfg, tdir, log_dir):
        calls["train"] += 1
        loss_fn = model.make_loss_fn(
            loss_cfg, initial_condition=prob.score_posterior
        )
        opt = optax.adam(1e-3)
        epoch_fn = train.make_epoch_fn(loss_fn, opt, batch_fn,
                                       epochs_per_call=2, donate=False)
        params, _, _ = train.fit(
            epoch_fn, model.init(k_init), opt, k_train, num_epochs=4,
            epochs_per_call=2, log_every=0,
        )
        return params

    def eval_fn(model, params, y_eval, out_dir):
        return evaluate.evaluate_linear(
            model, params, prob, y_eval, k_eval, out_dir=out_dir,
            n_samples_x=400, n_repeats=1, num_steps=8, nbins=15,
            verbose=False,
        )

    inner_train_many = ensemble.make_train_many(
        batch_fn, k_init, k_train, 1e-3, n_epochs=4, epochs_per_call=2,
        loss_kwargs={"initial_condition": prob.score_posterior},
    )

    def train_many(*a, **kw):
        calls["train_many"] += 1
        return inner_train_many(*a, **kw)

    seq = gridsearch.grid_search(
        ys[:2], config("seq"), {"xdim": 2, "ydim": 2},
        train_fn, eval_fn, {}, {},
    )
    ens_res = gridsearch.grid_search(
        ys[:2], config("ens"), {"xdim": 2, "ydim": 2},
        train_fn, eval_fn, {}, {}, train_many=train_many,
    )
    assert calls["train_many"] == 1
    assert calls["train"] == 2  # sequential pass only
    assert len(seq["results"]) == len(ens_res["results"]) == 2
    for a, b in zip(seq["results"], ens_res["results"]):
        assert a["lam"] == b["lam"]
        np.testing.assert_allclose(a["kl"], b["kl"], rtol=1e-3)
        np.testing.assert_allclose(a["fisher"], b["fisher"], rtol=1e-3)


def test_pinned_ensemble_matches_sequential_trials(setup):
    """The device-PINNED backend (one trial per device via shard_map) equals
    the sequential runs — same init, key schedule, batches (VERDICT r4 #4)."""
    prob, model, cfg, batch_fn = setup
    lams, lam2s, n_valid = ensemble.pad_trials([0.5, 0.05, 1.0],
                                               [1.0, 0.1, 0.3], 8)
    n_epochs, epc = 4, 2
    mesh = get_mesh(8)
    opt = optax.adam(1e-3)
    epoch_fn = ensemble.make_pinned_ensemble_epoch_fn(
        model, cfg, opt, batch_fn, mesh, epochs_per_call=epc,
        loss_kwargs={"initial_condition": prob.score_posterior},
        donate=False,
    )
    ens = ensemble.init_ensemble(model, jax.random.PRNGKey(1), 8)
    ens, hist = ensemble.ensemble_fit(
        epoch_fn, ens, opt, jax.random.PRNGKey(2), n_epochs,
        lams, lam2s, epochs_per_call=epc, log_every=0, mesh=mesh,
    )
    assert hist.shape == (n_epochs, 8)

    for i in range(n_valid):
        p_seq = _sequential_run(prob, model, cfg, batch_fn,
                                float(lams[i]), float(lam2s[i]),
                                n_epochs, epc)
        p_ens = ensemble.trial_params(ens, i)
        for a, b in zip(jax.tree_util.tree_leaves(p_seq),
                        jax.tree_util.tree_leaves(p_ens)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=2e-5)


def test_pinned_wrong_trial_count_raises(setup):
    prob, model, cfg, batch_fn = setup
    mesh = get_mesh(8)
    epoch_fn = ensemble.make_pinned_ensemble_epoch_fn(
        model, cfg, optax.adam(1e-3), batch_fn, mesh,
        loss_kwargs={"initial_condition": prob.score_posterior}, donate=False,
    )
    ens = ensemble.init_ensemble(model, jax.random.PRNGKey(1), 3)
    opt_state = jax.vmap(optax.adam(1e-3).init)(ens)
    with pytest.raises(ValueError, match="mesh.size"):
        epoch_fn(ens, opt_state, jax.random.PRNGKey(2), 0,
                 jnp.ones(3), jnp.ones(3), 1)
