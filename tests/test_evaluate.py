"""Evaluation tests: device histogram parity with numpy, KL semantics,
end-to-end evaluate_linear with a perfect analytic score."""

import jax
import jax.numpy as jnp
import numpy as np

from dmip_tpu.evaluate import (
    evaluate_linear,
    histogramdd_flat,
    kl_pair,
    make_eval_y_linear,
)
from dmip_tpu.models import CDE
from dmip_tpu.problems import LinearForwardProblem


def test_histogramdd_matches_numpy_2d(key):
    x = jax.random.normal(key, (50_000, 2)) * 1.5
    nbins, lo, hi = 75, -3.5, 3.5
    ours = np.asarray(histogramdd_flat(x, nbins, lo, hi)).reshape(nbins, nbins)
    ref, _ = np.histogramdd(
        np.asarray(x), bins=(nbins, nbins), range=((lo, hi), (lo, hi))
    )
    np.testing.assert_array_equal(ours, ref)


def test_histogramdd_matches_numpy_3d(key):
    x = jax.random.uniform(key, (20_000, 3)) * 3.0 - 1.5
    nbins, lo, hi = 25, -1.2, 1.2
    ours = np.asarray(histogramdd_flat(x, nbins, lo, hi)).reshape(
        nbins, nbins, nbins
    )
    ref, _ = np.histogramdd(
        np.asarray(x), bins=(nbins,) * 3, range=((lo, hi),) * 3
    )
    np.testing.assert_array_equal(ours, ref)


def test_histogram_edge_cases():
    # exactly on upper edge -> last bin; out of range -> dropped
    x = jnp.array([[3.5, 3.5], [-3.5, -3.5], [3.6, 0.0], [0.0, -4.0]])
    h = np.asarray(histogramdd_flat(x, 10, -3.5, 3.5)).reshape(10, 10)
    assert h.sum() == 2
    assert h[9, 9] == 1 and h[0, 0] == 1


def test_kl_pair_matches_scipy_rel_entr(key):
    from scipy.special import rel_entr

    k1, k2 = jax.random.split(key)
    h1 = jax.random.uniform(k1, (100,))
    h2 = jax.random.uniform(k2, (100,))
    kl, kl_rev = kl_pair(h1, h2)
    eps = 1e-10
    p = np.asarray(h1) / np.sum(np.asarray(h1)) + eps
    q = np.asarray(h2) / np.sum(np.asarray(h2)) + eps
    p, q = p / p.sum(), q / q.sum()
    np.testing.assert_allclose(float(kl), rel_entr(p, q).sum(), rtol=1e-4)
    np.testing.assert_allclose(float(kl_rev), rel_entr(q, p).sum(), rtol=1e-4)


def test_evaluate_linear_perfect_score_low_kl(key, tmp_path):
    """Plug the analytic diffused score in as the 'net': KL must be tiny,
    score-MSE ~ 0, NLPD ~ 0 — the full evaluation pipeline oracle."""
    prob = LinearForwardProblem()

    class PerfectModel(CDE):
        def init(self, key):
            return ()

        def apply_a(self, params, z, cond, t):
            # analytic diffused posterior score * g; cond tiles a single y
            tt = jnp.asarray(t)
            t0 = tt.reshape(-1)[0] if tt.ndim > 0 else tt
            y = cond[0]
            score = prob.diffused_posterior_score(self.sde.base, z, y, t0)
            return self.sde.base.g(t0) * score

    model = PerfectModel(xdim=2, ydim=2)
    ys = prob.forward(jax.random.normal(key, (3, 2)))
    kl, nlpd, mse = evaluate_linear(
        model, (), prob, ys, key,
        out_dir=str(tmp_path), plot_ys=[0],
        n_samples_x=20_000, n_repeats=3, num_steps=200, verbose=False,
    )
    # finite-sample histogram-KL bias (~#bins/2N per side) + E-M
    # discretization put the floor around 0.05 at this sample count
    assert kl < 0.08, kl
    assert nlpd < 0.05, nlpd
    assert mse < 1e-3, mse
    assert (tmp_path / "results.csv").exists()
    assert (tmp_path / "posterior-true-0.svg").exists()
    assert (tmp_path / "posterior-diffusion-0.svg").exists()


def test_sliced_w2_properties(key):
    from dmip_tpu.evaluate import sliced_w2

    k1, k2, k3 = jax.random.split(key, 3)
    x = jax.random.normal(k1, (4000, 2))
    y = jax.random.normal(k2, (4000, 2))
    same = sliced_w2(k3, x, x)
    np.testing.assert_allclose(float(same), 0.0, atol=1e-6)
    close = float(sliced_w2(k3, x, y))
    assert close < 0.1  # same distribution, finite-sample
    shifted = float(sliced_w2(k3, x, y + 3.0))
    # mean shift of norm 3*sqrt(2) appears as ~ projected shift
    assert 1.5 < shifted < 4.5


def test_evaluate_linear_sharded_matches_sequential(key, tmp_path):
    """The product path (VERDICT r1 #2): evaluate_linear on an 8-device mesh
    must produce the same results.csv as the sequential per-y walk — the key
    schedule is shared, only the dispatch layout differs."""
    import csv

    from dmip_tpu.parallel.mesh import get_mesh

    prob = LinearForwardProblem()
    model = CDE(2, 2, (16, 16))
    params = model.init(key)
    ys = prob.forward(jax.random.normal(key, (11, 2)))  # 11: pads last chunk

    common = dict(
        n_samples_x=512, n_repeats=2, num_steps=10, nbins=20, verbose=False,
    )
    kd = jax.random.fold_in(key, 7)
    seq = evaluate_linear(
        model, params, prob, ys, kd, out_dir=str(tmp_path / "seq"),
        mesh=None, **common,
    )
    shd = evaluate_linear(
        model, params, prob, ys, kd, out_dir=str(tmp_path / "shd"),
        mesh=get_mesh(8), **common,
    )
    np.testing.assert_allclose(seq, shd, rtol=1e-4)

    def read(p):
        with open(p) as f:
            return list(csv.reader(f))

    rows_s = read(tmp_path / "seq" / "results.csv")
    rows_m = read(tmp_path / "shd" / "results.csv")
    assert rows_s[0] == rows_m[0]
    a = np.asarray([[float(v) for v in r[1:]] for r in rows_s[1:]])
    b = np.asarray([[float(v) for v in r[1:]] for r in rows_m[1:]])
    assert a.shape == (11, 5)
    np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-6)


def test_evaluate_scatterometry_sharded_matches_sequential(key, tmp_path):
    """Same 1-vs-8-device equivalence for the scatterometry harness, with a
    synthetic 3-d problem standing in for the surrogate."""
    import csv

    from dmip_tpu.evaluate import evaluate_scatterometry
    from dmip_tpu.parallel.mesh import get_mesh

    model = CDE(3, 4, (16, 16))
    params = model.init(key)
    fwd = lambda x: jnp.tanh(x @ jnp.ones((3, 4)) * 0.3)
    fparams = {"a": 0.2, "b": 0.01, "lambd_bd": 1000.0}
    score_post = lambda x, y: -x
    ys = fwd(jax.random.normal(key, (5, 3)))
    rng = np.random.default_rng(0)
    gt = rng.standard_normal((5, 3, 256, 3)).astype(np.float32) * 0.3

    common = dict(
        n_samples_x=256, n_repeats=3, num_steps=8, nbins=10, verbose=False,
    )
    kd = jax.random.fold_in(key, 9)
    seq = evaluate_scatterometry(
        model, params, fwd, fparams, score_post, ys,
        lambda i, j: gt[i, j], kd, out_dir=str(tmp_path / "seq"),
        mesh=None, **common,
    )
    shd = evaluate_scatterometry(
        model, params, fwd, fparams, score_post, ys,
        lambda i, j: gt[i, j], kd, out_dir=str(tmp_path / "shd"),
        mesh=get_mesh(8), **common,
    )
    np.testing.assert_allclose(seq, shd, rtol=1e-4)

    def read(p):
        with open(p) as f:
            return list(csv.reader(f))

    rows_s = read(tmp_path / "seq" / "results.csv")
    rows_m = read(tmp_path / "shd" / "results.csv")
    assert rows_s[0] == rows_m[0]
    a = np.asarray([[float(v) for v in r[1:]] for r in rows_s[1:]])
    b = np.asarray([[float(v) for v in r[1:]] for r in rows_m[1:]])
    assert a.shape == (5, 6)  # KL2, KL_reverse, NLL_mcmc, NLL_diffusion, MSE, W2
    np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-6)


def test_evaluate_scatterometry_refined_sharded_matches_sequential(key):
    """Flagship interplay: the EnergyRefinedModel (fused-proposal surface +
    lax.scan MH refinement) through the condition-sharded eval path must
    match the sequential walk exactly, like the plain model does."""
    from dmip_tpu.evaluate import evaluate_scatterometry
    from dmip_tpu.models.refined import EnergyRefinedModel
    from dmip_tpu.parallel.mesh import get_mesh
    from dmip_tpu.problems.scatterometry import get_log_posterior

    model = CDE(3, 4, (16, 16))
    params = model.init(key)
    fwd = lambda x: jnp.tanh(x @ jnp.ones((3, 4)) * 0.3)
    fparams = {"a": 0.2, "b": 0.01, "lambd_bd": 1000.0}
    energy = lambda x, yt: get_log_posterior(
        x, fwd, fparams["a"], fparams["b"], yt, fparams["lambd_bd"]
    )
    refined = EnergyRefinedModel(model, energy, refine_steps=4,
                                 kernel="mh", noise_std=0.3)
    score_post = lambda x, y: -x
    ys = fwd(jax.random.normal(key, (4, 3)))
    rng = np.random.default_rng(0)
    gt = rng.standard_normal((4, 2, 128, 3)).astype(np.float32) * 0.3

    common = dict(
        n_samples_x=128, n_repeats=2, num_steps=8, nbins=10, verbose=False,
    )
    kd = jax.random.fold_in(key, 11)
    seq = evaluate_scatterometry(
        refined, params, fwd, fparams, score_post, ys,
        lambda i, j: gt[i, j], kd, mesh=None, **common,
    )
    shd = evaluate_scatterometry(
        refined, params, fwd, fparams, score_post, ys,
        lambda i, j: gt[i, j], kd, mesh=get_mesh(8), **common,
    )
    np.testing.assert_allclose(seq, shd, rtol=1e-4)


def test_evaluate_scatterometry_gt_size_differs_from_n_samples_x(key, tmp_path):
    """GT repeats may carry a different sample count than n_samples_x (full
    30k MCMC halves scored against a reduced-eval run): y must tile per
    consumer array and NLLs normalize by each array's own count."""
    from dmip_tpu.evaluate import evaluate_scatterometry

    model = CDE(3, 4, (16, 16))
    params = model.init(key)
    fwd = lambda x: jnp.tanh(x @ jnp.ones((3, 4)) * 0.3)
    fparams = {"a": 0.2, "b": 0.01, "lambd_bd": 1000.0}
    score_post = lambda x, y: -x
    ys = fwd(jax.random.normal(key, (3, 3)))
    rng = np.random.default_rng(0)
    gt = rng.standard_normal((3, 2, 512, 3)).astype(np.float32) * 0.3

    kl, nlpd, mse = evaluate_scatterometry(
        model, params, fwd, fparams, score_post, ys,
        lambda i, j: gt[i, j], jax.random.fold_in(key, 9),
        out_dir=str(tmp_path), mesh=None, n_samples_x=256, n_repeats=2,
        num_steps=8, nbins=10, verbose=False,
    )
    assert np.isfinite([kl, nlpd, mse]).all()

    # doubling the GT count must leave per-sample NLL normalization intact:
    # NLL_true is a mean, so duplicating GT rows changes nothing
    gt2 = np.concatenate([gt, gt], axis=2)
    kl2, nlpd2, _ = evaluate_scatterometry(
        model, params, fwd, fparams, score_post, ys,
        lambda i, j: gt2[i, j], jax.random.fold_in(key, 9),
        out_dir=str(tmp_path / "b"), mesh=None, n_samples_x=256, n_repeats=2,
        num_steps=8, nbins=10, verbose=False,
    )
    np.testing.assert_allclose(kl2, kl, rtol=1e-5)
    np.testing.assert_allclose(nlpd2, nlpd, rtol=1e-4)


def test_evaluate_linear_heun_method_plumbed(key, tmp_path):
    """evaluate_linear(method='heun') drives the probability-flow ODE
    sampler through the whole harness and still nails the analytic
    posterior with far fewer steps than E-M needs."""
    prob = LinearForwardProblem()

    class PerfectModel(CDE):
        def init(self, key):
            return ()

        def apply_a(self, params, z, cond, t):
            tt = jnp.asarray(t)
            t0 = tt.reshape(-1)[0] if tt.ndim > 0 else tt
            y = cond[0]
            score = prob.diffused_posterior_score(self.sde.base, z, y, t0)
            return self.sde.base.g(t0) * score

    model = PerfectModel(xdim=2, ydim=2)
    ys = prob.forward(jax.random.normal(key, (2, 2)))
    kl, nlpd, mse = evaluate_linear(
        model, (), prob, ys, key, n_samples_x=10_000, n_repeats=2,
        num_steps=40, verbose=False, mesh=None, method="heun",
    )
    assert np.isfinite(kl) and kl < 0.2, kl
    assert np.isfinite(nlpd)


def test_cdiffe_sample_rejects_heun(key):
    from dmip_tpu.models import CDiffE

    model = CDiffE(xdim=2, ydim=2, hidden_layers=[8])
    params = model.init(key)
    y = jnp.zeros((2,))
    try:
        model.sample(params, key, y, 16, 4, method="heun")
    except ValueError:
        return
    raise AssertionError("CDiffE.sample(method='heun') should raise")


def test_evaluate_linear_chunked_matches_sequential(key, tmp_path):
    """Single-device condition-chunked evaluation (chunk=) must reproduce the
    sequential walk exactly — same key schedule, one dispatch per chunk."""
    prob = LinearForwardProblem()
    model = CDE(2, 2, (16, 16))
    params = model.init(key)
    ys = prob.forward(jax.random.normal(key, (7, 2)))  # 7: pads last chunk

    common = dict(
        n_samples_x=256, n_repeats=2, num_steps=10, nbins=20, verbose=False,
    )
    kd = jax.random.fold_in(key, 3)
    seq = evaluate_linear(model, params, prob, ys, kd, mesh=None, **common)
    chk = evaluate_linear(model, params, prob, ys, kd, mesh=None, chunk=3,
                          **common)
    np.testing.assert_allclose(seq, chk, rtol=1e-4)


def test_evaluate_scatterometry_chunked_matches_sequential(key, tmp_path):
    from dmip_tpu.evaluate import evaluate_scatterometry

    model = CDE(3, 4, (16, 16))
    params = model.init(key)
    fwd = lambda x: jnp.tanh(x @ jnp.ones((3, 4)) * 0.3)
    fparams = {"a": 0.2, "b": 0.01, "lambd_bd": 1000.0}
    score_post = lambda x, y: -x
    ys = fwd(jax.random.normal(key, (5, 3)))
    rng = np.random.default_rng(0)
    gt = rng.uniform(-1, 1, size=(5, 2, 256, 3)).astype(np.float32)

    common = dict(
        n_samples_x=256, n_repeats=2, num_steps=10, nbins=10, verbose=False,
    )
    kd = jax.random.fold_in(key, 9)
    seq = evaluate_scatterometry(
        model, params, fwd, fparams, score_post, ys,
        lambda i, j: gt[i, j], kd, mesh=None, **common)
    chk = evaluate_scatterometry(
        model, params, fwd, fparams, score_post, ys,
        lambda i, j: gt[i, j], kd, mesh=None, chunk=2, **common)
    np.testing.assert_allclose(seq, chk, rtol=1e-4)


def test_evaluate_scatterometry_chunked_heartbeat(key, capsys):
    """The progress heartbeat must fire on BOUNDARY CROSSINGS: with chunk=2
    and progress_every=3, done advances 2,4,5 — no exact multiple of 3 —
    yet the 3-boundary crossing (done=4) must print."""
    from dmip_tpu.evaluate import evaluate_scatterometry

    model = CDE(3, 4, (16, 16))
    params = model.init(key)
    fwd = lambda x: jnp.tanh(x @ jnp.ones((3, 4)) * 0.3)
    fparams = {"a": 0.2, "b": 0.01, "lambd_bd": 1000.0}
    ys = fwd(jax.random.normal(key, (5, 3)))
    rng = np.random.default_rng(0)
    gt = rng.uniform(-1, 1, size=(5, 1, 128, 3)).astype(np.float32)

    evaluate_scatterometry(
        model, params, fwd, fparams, lambda x, y: -x, ys,
        lambda i, j: gt[i, j], jax.random.fold_in(key, 9), mesh=None,
        chunk=2, progress_every=3, n_samples_x=128, n_repeats=1,
        num_steps=5, nbins=10, verbose=False)
    lines = [l for l in capsys.readouterr().out.splitlines()
             if l.startswith("[eval-scat]")]
    assert any("4/5" in l for l in lines), lines  # crossing of done=3
    assert any("5/5" in l for l in lines), lines  # completion


def test_gt_floor_scatterometry(key):
    """GT-vs-GT floor: two halves of the SAME sample set must floor near 0;
    disjoint finite halves of a distribution give a positive, finite floor."""
    from dmip_tpu.evaluate import gt_floor_scatterometry

    rng = np.random.default_rng(1)
    gt = rng.uniform(-1, 1, size=(2, 4, 500, 3)).astype(np.float32)
    out = gt_floor_scatterometry(lambda i, j: gt[i, j], n_conditions=2,
                                 n_repeats=4, nbins=10)
    assert out["kl"].shape == (2,)
    assert np.all(out["kl"] > 0) and np.all(np.isfinite(out["kl"]))
    assert np.all(out["w2"] >= 0)

    # identical halves -> zero floor
    same = np.stack([gt[:, 0], gt[:, 1], gt[:, 0], gt[:, 1]], axis=1)
    out0 = gt_floor_scatterometry(lambda i, j: same[i, j], n_conditions=2,
                                  n_repeats=4, nbins=10)
    np.testing.assert_allclose(out0["kl"], 0.0, atol=1e-5)
