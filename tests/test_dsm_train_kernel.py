"""Parity tests for the fused DSM training kernel
(dmip_tpu/ops/dsm_train_kernel.py) against the XLA epoch path
(train.make_epoch_fn + the DSM branch of DiffusionModel.make_loss_fn), in
Pallas interpret mode on CPU.

The fused wrapper replicates the XLA path's key schedule exactly (same
per-epoch fold_in, per-batch splits, kt/keps draws), so in f32 compute the
two paths must agree at parameter level to float-reassociation tolerance.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from dmip_tpu import data, train
from dmip_tpu.ops.dsm_train_kernel import make_fused_dsm_epoch_fn
from dmip_tpu.train import get_model_from_args


@pytest.fixture
def key():
    return jax.random.PRNGKey(3)


def _setup(key, model_name="CDE", batch=16, n_batches=3, hidden=(32, 32)):
    from dmip_tpu.problems import LinearForwardProblem

    prob = LinearForwardProblem()
    xs, ys = data.generate_dataset_linear(
        key, prob.xdim, prob.forward, n_batches * batch
    )
    model, cfg = get_model_from_args(
        {"model": model_name, "loss_fn": "DSM", "hidden_layers": list(hidden)},
        {"xdim": 2, "ydim": 2},
    )
    batch_fn = lambda k: data.linear_epoch_batches(
        k, xs, ys, prob.noise_std, batch
    )
    return model, cfg, batch_fn


def _run_both(key, model, cfg, batch_fn, lr=1e-3, epochs_per_call=2,
              epoch0=0, n_active=None, params=None, opt_state=None):
    opt = optax.adam(lr)
    loss_fn = model.make_loss_fn(cfg)
    ref_fn = train.make_epoch_fn(loss_fn, opt, batch_fn,
                                 epochs_per_call=epochs_per_call, donate=False)
    fused_fn = make_fused_dsm_epoch_fn(
        model, lr, batch_fn, epochs_per_call=epochs_per_call,
        compute_dtype=jnp.float32, interpret=True, donate=False,
    )
    if params is None:
        params = model.init(key)
    if opt_state is None:
        opt_state = opt.init(params)
    if n_active is None:
        ref = ref_fn(params, opt_state, key, epoch0)
        fused = fused_fn(params, opt_state, key, epoch0)
    else:
        ref = ref_fn(params, opt_state, key, epoch0, n_active)
        fused = fused_fn(params, opt_state, key, epoch0, n_active)
    return ref, fused


def _max_diff(a, b):
    d = jax.tree_util.tree_map(
        lambda x, y: float(jnp.max(jnp.abs(x - y))), a, b
    )
    return jax.tree_util.tree_reduce(max, d)


def test_fused_matches_xla_epoch_fn(key):
    model, cfg, batch_fn = _setup(key)
    (p1, o1, l1, _), (p2, o2, l2, _) = _run_both(key, model, cfg, batch_fn)
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l2), rtol=1e-5)
    assert _max_diff(p1, p2) < 1e-5
    assert int(o1[0].count) == int(o2[0].count) == 6
    assert _max_diff(o1[0].mu, o2[0].mu) < 1e-6
    assert _max_diff(o1[0].nu, o2[0].nu) < 1e-7


def test_fused_chunking_is_exact(key):
    """Two 2-epoch calls == one 4-epoch call (the epoch0 key schedule)."""
    model, cfg, batch_fn = _setup(key)
    lr = 1e-3
    opt = optax.adam(lr)
    params = model.init(key)

    fused4 = make_fused_dsm_epoch_fn(model, lr, batch_fn, epochs_per_call=4,
                                     compute_dtype=jnp.float32,
                                     interpret=True, donate=False)
    fused2 = make_fused_dsm_epoch_fn(model, lr, batch_fn, epochs_per_call=2,
                                     compute_dtype=jnp.float32,
                                     interpret=True, donate=False)
    pa, oa, la, _ = fused4(params, opt.init(params), key, 0)
    pb, ob, lb1, _ = fused2(params, opt.init(params), key, 0)
    pb, ob, lb2, _ = fused2(pb, ob, key, 2)
    np.testing.assert_allclose(
        np.asarray(la), np.concatenate([lb1, lb2]), rtol=1e-6
    )
    assert _max_diff(pa, pb) < 1e-6
    assert int(oa[0].count) == int(ob[0].count) == 12


def test_fused_n_active_masks_updates(key):
    """Epochs >= n_active leave params/opt state untouched.

    Only losses[:n_active] must match the XLA path: for the discarded
    epochs the XLA masked_epoch still trains batch-to-batch inside the
    epoch before dropping the result, while the fused kernel freezes per
    step — fit() never consumes those values (train.py's epoch loop breaks
    at num_epochs)."""
    model, cfg, batch_fn = _setup(key)
    (p1, o1, l1, _), (p2, o2, l2, _) = _run_both(
        key, model, cfg, batch_fn, epochs_per_call=3,
        n_active=jnp.asarray(1, jnp.int32),
    )
    np.testing.assert_allclose(np.asarray(l1)[:1], np.asarray(l2)[:1],
                               rtol=1e-5)
    assert _max_diff(p1, p2) < 1e-5
    assert int(o1[0].count) == int(o2[0].count) == 3  # 1 epoch x 3 batches


def test_fused_skip_nonfinite_matches(key):
    """A NaN batch is skipped by both paths; counts stay in lockstep."""
    from dmip_tpu.problems import LinearForwardProblem

    prob = LinearForwardProblem()
    batch, n_batches = 16, 3
    xs, ys = data.generate_dataset_linear(
        key, prob.xdim, prob.forward, n_batches * batch
    )
    xs = xs.at[5, 0].set(jnp.nan)  # lands in some batch every epoch
    model, cfg = get_model_from_args(
        {"model": "CDE", "loss_fn": "DSM", "hidden_layers": [32, 32]},
        {"xdim": 2, "ydim": 2},
    )
    batch_fn = lambda k: data.linear_epoch_batches(
        k, xs, ys, prob.noise_std, batch
    )
    (p1, o1, l1, _), (p2, o2, l2, _) = _run_both(key, model, cfg, batch_fn)
    assert int(o1[0].count) == int(o2[0].count) < 6
    assert _max_diff(p1, p2) < 1e-5
    # params stayed finite despite the poisoned batch
    assert all(
        bool(jnp.all(jnp.isfinite(x)))
        for x in jax.tree_util.tree_leaves(p2)
    )


def test_fused_unaligned_batch_rows(key):
    """batch % 8 != 0 pads rows without changing the update."""
    model, cfg, batch_fn = _setup(key, batch=12, n_batches=2)
    (p1, o1, l1, _), (p2, o2, l2, _) = _run_both(key, model, cfg, batch_fn)
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l2), rtol=1e-5)
    assert _max_diff(p1, p2) < 1e-5


def test_fused_cdiffe_joint_state(key):
    """CDiffE's joint diffused state (cond folded in, net_out=xdim+ydim)."""
    model, cfg, batch_fn = _setup(key, model_name="CDiffE")
    (p1, o1, l1, _), (p2, o2, l2, _) = _run_both(key, model, cfg, batch_fn)
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l2), rtol=1e-5)
    assert _max_diff(p1, p2) < 1e-5


def test_fused_loss_decreases(key):
    """End-to-end sanity: the fused path actually trains."""
    model, cfg, batch_fn = _setup(key, batch=32, n_batches=4)
    lr = 1e-2
    opt = optax.adam(lr)
    fused_fn = make_fused_dsm_epoch_fn(model, lr, batch_fn,
                                       epochs_per_call=8,
                                       compute_dtype=jnp.float32,
                                       interpret=True, donate=False)
    params = model.init(key)
    _, _, losses, _ = fused_fn(params, opt.init(params), key, 0)
    losses = np.asarray(losses)
    assert losses[-1] < losses[0]


def test_fused_loss_guard_skips_poisoned_batch(key):
    """skip_nonfinite='loss' (the cheap scalar guard) skips the NaN batch
    exactly like the full grads guard on the realistic failure mode
    (non-finite data -> non-finite loss)."""
    from dmip_tpu.problems import LinearForwardProblem

    prob = LinearForwardProblem()
    batch, n_batches = 16, 3
    xs, ys = data.generate_dataset_linear(
        key, prob.xdim, prob.forward, n_batches * batch
    )
    xs = xs.at[5, 0].set(jnp.nan)
    model, cfg = get_model_from_args(
        {"model": "CDE", "loss_fn": "DSM", "hidden_layers": [32, 32]},
        {"xdim": 2, "ydim": 2},
    )
    batch_fn = lambda k: data.linear_epoch_batches(
        k, xs, ys, prob.noise_std, batch
    )
    lr = 1e-3
    opt = optax.adam(lr)
    params = model.init(key)
    outs = {}
    for guard in (True, "loss"):
        fn = make_fused_dsm_epoch_fn(
            model, lr, batch_fn, epochs_per_call=2,
            compute_dtype=jnp.float32, interpret=True, donate=False,
            skip_nonfinite=guard,
        )
        outs[guard] = fn(params, opt.init(params), key, 0)
    p_g, o_g = outs[True][0], outs[True][1]
    p_l, o_l = outs["loss"][0], outs["loss"][1]
    assert int(o_g[0].count) == int(o_l[0].count) < 6
    assert _max_diff(p_g, p_l) == 0.0
    assert all(
        bool(jnp.all(jnp.isfinite(x)))
        for x in jax.tree_util.tree_leaves(p_l)
    )
