"""Training infrastructure: multi-epoch scan equivalence, fit driver,
checkpoint roundtrip, data batching."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from dmip_tpu import checkpoints, data, train
from dmip_tpu.models import CDE, LossConfig
from dmip_tpu.problems import LinearForwardProblem


def _setup(key, n=2000):
    prob = LinearForwardProblem()
    xs, ys = data.generate_dataset_linear(key, prob.xdim, prob.forward, n)
    model = CDE(2, 2, (32, 32))
    loss_fn = model.make_loss_fn(LossConfig(name="DSM"))
    return prob, xs, ys, model, loss_fn


def test_linear_epoch_batches_shapes_and_noise(key):
    prob, xs, ys, *_ = _setup(key)
    xb, yb = data.linear_epoch_batches(key, xs, ys, prob.scale, 256)
    assert xb.shape == (7, 256, 2) and yb.shape == (7, 256, 2)
    # fresh noise: two different keys give different ys for same xs
    k2 = jax.random.fold_in(key, 1)
    xb2, yb2 = data.linear_epoch_batches(k2, xs, ys, prob.scale, 256)
    assert not np.allclose(np.asarray(yb), np.asarray(yb2))


def test_scatterometry_epoch_batches(key):
    from dmip_tpu.problems import scatterometry as scat

    fwd, p = scat.load_forward_model()
    xb, yb = data.scatterometry_epoch_batches(
        key, fwd, p["a"], p["b"], p["lambd_bd"], 64
    )
    assert xb.shape == (8, 64, 3) and yb.shape == (8, 64, 23)
    # fresh simulation per call
    xb2, _ = data.scatterometry_epoch_batches(
        jax.random.fold_in(key, 1), fwd, p["a"], p["b"], p["lambd_bd"], 64
    )
    assert not np.allclose(np.asarray(xb), np.asarray(xb2))


def test_multi_epoch_scan_equals_sequential_epochs(key):
    """epochs_per_call=4 must produce bit-identical params to 4 single-epoch
    calls with the same key schedule."""
    prob, xs, ys, model, loss_fn = _setup(key)
    opt = optax.adam(1e-3)
    batch_fn = lambda k: data.linear_epoch_batches(k, xs, ys, prob.scale, 500)

    p0 = model.init(key)
    s0 = opt.init(p0)

    master = jax.random.PRNGKey(7)
    multi = train.make_epoch_fn(loss_fn, opt, batch_fn, epochs_per_call=4,
                                donate=False)
    p_multi, s_multi, losses_m, _ = multi(p0, s0, master, 0)

    single = train.make_epoch_fn(loss_fn, opt, batch_fn, epochs_per_call=1,
                                 donate=False)
    p_seq, s_seq = p0, s0
    losses_s = []
    for e in range(4):
        p_seq, s_seq, ls, _ = single(p_seq, s_seq, master, e)
        losses_s.append(float(ls[0]))

    np.testing.assert_allclose(np.asarray(losses_m), losses_s, rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(p_multi),
                    jax.tree_util.tree_leaves(p_seq)):
        np.testing.assert_allclose(a, b, atol=1e-6)


def test_fit_runs_and_logs(key, tmp_path):
    from dmip_tpu.utils import MetricsWriter

    prob, xs, ys, model, loss_fn = _setup(key)
    opt = optax.adam(1e-3)
    batch_fn = lambda k: data.linear_epoch_batches(k, xs, ys, prob.scale, 500)
    epoch_fn = train.make_epoch_fn(loss_fn, opt, batch_fn, epochs_per_call=3)
    params = model.init(key)
    with MetricsWriter(str(tmp_path)) as logger:
        params, _opt, info = train.fit(
            epoch_fn, params, opt, key, num_epochs=7, epochs_per_call=3,
            log_every=0, logger=logger,
        )
    events = (tmp_path / "events.jsonl").read_text().strip().splitlines()
    # 7 epochs logged despite 3 calls of 3 epochs (last call truncated)
    assert len([e for e in events if '"Train/Loss"' in e]) == 7


def test_checkpoint_roundtrip(tmp_path, key):
    prob, xs, ys, model, loss_fn = _setup(key)
    params = model.init(key)
    opt = optax.adam(1e-3)
    opt_state = opt.init(params)
    checkpoints.save_checkpoint(
        str(tmp_path), params, opt_state, step=42, key=key,
        extra={"note": "hi"},
    )
    restored = checkpoints.load_checkpoint(str(tmp_path), params, opt_state)
    assert restored["step"] == 42
    assert restored["extra"] == {"note": "hi"}
    for a, b in zip(jax.tree_util.tree_leaves(params),
                    jax.tree_util.tree_leaves(restored["params"])):
        np.testing.assert_array_equal(a, b)
    np.testing.assert_array_equal(np.asarray(key), np.asarray(restored["key"]))
    # optimizer state restored exactly
    for a, b in zip(jax.tree_util.tree_leaves(opt_state),
                    jax.tree_util.tree_leaves(restored["opt_state"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_plot_csv_and_metrics_roundtrip(tmp_path):
    from dmip_tpu.utils import MetricsWriter
    from dmip_tpu.utils.plotting import plot_csv

    with MetricsWriter(str(tmp_path)) as w:
        for i in range(120):
            w.scalar("Train/Loss", 1.0 / (i + 1), i)
    csv_path = tmp_path / "Train_Loss.csv"
    assert csv_path.exists()
    plot_csv(str(csv_path), str(tmp_path / "curve.svg"), labelsize=10,
             max_step=100)
    assert (tmp_path / "curve.svg").exists()


def test_profiling_timeit():
    import jax.numpy as jnp

    from dmip_tpu.utils.profiling import timeit

    f = jax.jit(lambda x: x * 2.0)
    dt, out = timeit(f, jnp.ones((8,)), reps=2)
    assert dt >= 0.0
    np.testing.assert_allclose(out, 2.0)


def test_skip_nonfinite_update(key):
    """A batch with non-finite gradients must leave params/opt state
    untouched; finite batches update normally."""
    import jax.numpy as jnp

    bad = {"w": jnp.ones(3)}

    def loss_fn(params, k, x, y):
        # loss is inf when x sums over threshold
        scale = jnp.where(jnp.sum(x) > 1e5, jnp.inf, 1.0)
        return jnp.sum(params["w"] ** 2) * scale, {}

    opt = optax.adam(1e-1)
    step = jax.jit(train.make_train_step(loss_fn, opt))
    opt_state = opt.init(bad)
    x_ok = jnp.ones((2, 2))
    x_bad = jnp.full((2, 2), 1e6)
    p1, s1, loss1, _ = step(bad, opt_state, key, x_ok, x_ok)
    assert not np.allclose(np.asarray(p1["w"]), 1.0)  # updated
    p2, s2, loss2, _ = step(bad, opt_state, key, x_bad, x_bad)
    np.testing.assert_array_equal(np.asarray(p2["w"]), 1.0)  # skipped
    assert not np.isfinite(float(loss2))


def test_build_optimizer_clipping():
    opt = train.build_optimizer(1e-3, grad_clip=1.0)
    params = {"w": jnp.ones(4)}
    state = opt.init(params)
    g = {"w": jnp.full(4, 100.0)}
    updates, _ = opt.update(g, state, params)
    # clipped global norm -> update magnitude bounded by lr scale
    assert np.abs(np.asarray(updates["w"])).max() <= 1e-2 + 1e-6


def test_resume_is_exact(key, tmp_path):
    """Checkpoint at epoch 3 of 6 and resume: parameters must match an
    uninterrupted 6-epoch run bit-for-bit (fold_in key schedule +
    opt_state restore)."""
    prob, xs, ys, model, loss_fn = _setup(key)
    opt = optax.adam(1e-3)
    batch_fn = lambda k: data.linear_epoch_batches(k, xs, ys, prob.noise_std,
                                                   500)
    epoch_fn = train.make_epoch_fn(loss_fn, opt, batch_fn, epochs_per_call=3,
                                   donate=False)
    master = jax.random.PRNGKey(11)
    p0 = model.init(key)

    # uninterrupted
    p_full, s_full, _ = train.fit(epoch_fn, p0, opt, master, num_epochs=6,
                                  epochs_per_call=3, log_every=0)

    # interrupted at 3 + checkpoint + restore
    p_half, s_half, _ = train.fit(epoch_fn, p0, opt, master, num_epochs=3,
                                  epochs_per_call=3, log_every=0)
    checkpoints.save_checkpoint(str(tmp_path), p_half, s_half, step=3,
                                key=master)
    restored = checkpoints.load_checkpoint(str(tmp_path), p_half, s_half)
    p_res, s_res, _ = train.fit(
        epoch_fn, restored["params"], opt, restored["key"], num_epochs=6,
        epochs_per_call=3, log_every=0, opt_state=restored["opt_state"],
        start_epoch=restored["step"],
    )
    for a, b in zip(jax.tree_util.tree_leaves(p_full),
                    jax.tree_util.tree_leaves(p_res)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_fit_exact_epochs_on_partial_final_chunk(key):
    """num_epochs NOT divisible by epochs_per_call must advance parameters
    EXACTLY num_epochs epochs (round-1 footgun: it rounded up to the chunk
    boundary).  fit(7 epochs, chunks of 3) == fit(7 epochs, chunks of 1)."""
    prob, xs, ys, model, loss_fn = _setup(key)
    opt = optax.adam(1e-3)
    batch_fn = lambda k: data.linear_epoch_batches(k, xs, ys, prob.noise_std,
                                                   500)
    master = jax.random.PRNGKey(3)
    p0 = model.init(key)

    chunked = train.make_epoch_fn(loss_fn, opt, batch_fn, epochs_per_call=3,
                                  donate=False)
    p_c, _, _ = train.fit(chunked, p0, opt, master, num_epochs=7,
                          epochs_per_call=3, log_every=0)

    stepwise = train.make_epoch_fn(loss_fn, opt, batch_fn, epochs_per_call=1,
                                   donate=False)
    p_s, _, _ = train.fit(stepwise, p0, opt, master, num_epochs=7,
                          epochs_per_call=1, log_every=0)

    for a, b in zip(jax.tree_util.tree_leaves(p_c),
                    jax.tree_util.tree_leaves(p_s)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
