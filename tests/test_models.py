"""Model-level tests: every (model, loss) combination trains a step and the
loss decreases over a short run; samplers produce finite output."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from dmip_tpu import data, train
from dmip_tpu.models import CDE, CDiffE, LossConfig, PosteriorDiffusionEstimator
from dmip_tpu.problems import LinearForwardProblem, scatterometry as scat


@pytest.fixture(scope="module")
def linear_data():
    prob = LinearForwardProblem()
    key = jax.random.PRNGKey(0)
    xs, ys = data.generate_dataset_linear(key, prob.xdim, prob.forward, 2000)
    return prob, xs, ys


HID = (32, 32)


@pytest.mark.parametrize("model_cls", [CDE, CDiffE])
@pytest.mark.parametrize(
    "loss_name", ["DSM", "DSM_PDE", "PINNLoss", "PINNLoss2"]
)
def test_model_loss_combinations_train(linear_data, model_cls, loss_name, key):
    prob, xs, ys = linear_data
    model = model_cls(xdim=2, ydim=2, hidden_layers=HID)
    cfg = LossConfig(name=loss_name, lam=0.1, lam2=0.5)
    loss_fn = model.make_loss_fn(cfg, initial_condition=prob.score_posterior)
    params = model.init(key)
    opt = optax.adam(1e-3)
    step = jax.jit(train.make_train_step(loss_fn, opt))
    opt_state = opt.init(params)
    losses = []
    for i in range(30):
        k = jax.random.fold_in(key, i)
        params, opt_state, loss, info = step(
            params, opt_state, k, xs[:256], ys[:256]
        )
        losses.append(float(loss))
    assert np.all(np.isfinite(losses))
    assert losses[-1] < losses[0], (losses[0], losses[-1])


def test_cde_cdiffe_sample_shapes(key):
    for model in (CDE(2, 2, HID), CDiffE(2, 2, HID)):
        params = model.init(key)
        x = model.sample(params, key, jnp.array([0.5, -0.5]), 64, 20)
        assert x.shape == (64, 2)
        assert np.all(np.isfinite(np.asarray(x)))


def test_posterior_estimator_trains_and_samples(key):
    fwd, p = scat.load_forward_model()
    model = PosteriorDiffusionEstimator(xdim=3, ydim=23, hidden_layers=HID)
    cfg = LossConfig(name="PosteriorLoss", lam=0.1)
    loss_fn = model.make_loss_fn(cfg, forward_model=fwd, forward_params=p)
    params = model.init(key)
    assert set(params.keys()) == {"prior", "likelihood"}

    kx, kd = jax.random.split(key)
    x = scat.sample_prior(kx, 128, p["lambd_bd"])
    y = scat.noisy_forward(kd, fwd, x, p["a"], p["b"])

    opt = optax.adam(1e-3)
    step = jax.jit(train.make_train_step(loss_fn, opt))
    opt_state = opt.init(params)
    losses, priors = [], []
    for i in range(30):
        k = jax.random.fold_in(key, i)
        params, opt_state, loss, info = step(params, opt_state, k, x, y)
        losses.append(float(loss))
        priors.append(float(info["PriorLoss"]))
    assert np.all(np.isfinite(losses))
    # the total loss is dominated by the stochastic likelihood target (the
    # corrected SURVEY §2.3.13 target is large at small t where the
    # prefactor is tiny), so assert trend on the stable prior component and
    # on the smoothed total
    assert np.mean(priors[-5:]) < np.mean(priors[:5])
    assert np.mean(losses[-10:]) < np.mean(losses[:10]) * 1.5
    assert set(info.keys()) == {"PriorLoss", "LikelihoodLoss"}

    samples = model.sample(params, key, y[0], 32, 10)
    assert samples.shape == (32, 3)
    assert np.all(np.isfinite(np.asarray(samples)))


def test_factory_mirrors_reference_dispatch():
    fp = {"xdim": 2, "ydim": 2}
    m, c = train.get_model_from_args({"model": "CDE", "loss_fn": "DSM"}, fp)
    assert isinstance(m, CDE) and c.name == "DSM"
    m, c = train.get_model_from_args(
        {"model": "CDiffE", "loss_fn": "PINNLoss", "lam": 0.5, "lam2": 2.0,
         "pde_loss": "cScoreFPE", "pde_metric": "L2", "ic_metric": "L1"},
        fp,
    )
    assert isinstance(m, CDiffE)
    assert (c.lam, c.lam2, c.pde_loss, c.pde_metric, c.ic_metric) == (
        0.5, 2.0, "cScoreFPE", "L2", "L1")
    m, c = train.get_model_from_args({"model": "Posterior", "lam": 1.0}, fp)
    assert isinstance(m, PosteriorDiffusionEstimator)
    assert c.name == "PosteriorLoss"
    with pytest.raises(ValueError):
        train.get_model_from_args({"model": "nope", "loss_fn": "DSM"}, fp)


def test_cdiffe_dsm_matches_joint_dimension(linear_data, key):
    """CDiffE diffuses the joint z=[x,y]: its net outputs xdim+ydim and the
    DSM target is the full joint noise (reference models/diffusion.py:127-137)."""
    prob, xs, ys = linear_data
    model = CDiffE(2, 2, HID)
    assert model.net_out == 4
    params = model.init(key)
    z0, cond = model.diffusion_state(xs[:8], ys[:8])
    assert z0.shape == (8, 4)
    out = model.apply_a(params, z0, None, jnp.zeros((8, 1)))
    assert out.shape == (8, 4)


def test_analytic_guidance_dps_duck_types_and_clips(key):
    """AnalyticGuidanceDPS composes a trained prior net with the EXACT
    likelihood gradient (models/diffusion.py AnalyticGuidanceDPS); the
    guidance term must be norm-capped and the wrapper must drive the same
    sampling surface as the learned-likelihood model."""
    from dmip_tpu.models import AnalyticGuidanceDPS

    fwd, p = scat.load_forward_model()
    base = PosteriorDiffusionEstimator(xdim=3, ydim=23, hidden_layers=HID)
    params = base.init(key)
    ag = AnalyticGuidanceDPS(base, fwd, p, guidance_clip=5.0)
    assert ag.xdim == 3 and ag.ydim == 23 and ag.sde is base.sde

    kx, kd = jax.random.split(key)
    x = scat.sample_prior(kx, 16, p["lambd_bd"])
    y = scat.noisy_forward(kd, fwd, x, p["a"], p["b"])
    t = jnp.full((16, 1), 0.5)

    out = ag.apply_a(params, x, y, t)
    assert out.shape == (16, 3) and np.all(np.isfinite(np.asarray(out)))

    # the guidance term is ||s_total/g - s_prior|| <= clip per sample
    from dmip_tpu import nets
    g = base.sde.base.g(t)
    s_prior = nets.prior_mlp_apply(params["prior"], x, t)
    lik = np.asarray(out / g - s_prior)
    assert np.all(np.linalg.norm(lik, axis=-1) <= 5.0 + 1e-4)

    samples = ag.sample(params, key, y[0], 32, 10)
    assert samples.shape == (32, 3)
    assert np.all(np.isfinite(np.asarray(samples)))


def test_analytic_guidance_dps_pgdm_mode(key):
    """guidance='pgdm' routes through losses.pgdm_likelihood_score: finite,
    clipped, and genuinely different from the vanilla DPS guidance."""
    from dmip_tpu.models import AnalyticGuidanceDPS

    fwd, p = scat.load_forward_model()
    base = PosteriorDiffusionEstimator(xdim=3, ydim=23, hidden_layers=HID)
    params = base.init(key)

    kx, kd = jax.random.split(key)
    x = scat.sample_prior(kx, 8, p["lambd_bd"])
    y = scat.noisy_forward(kd, fwd, x, p["a"], p["b"])
    t = jnp.full((8, 1), 0.5)

    dps = AnalyticGuidanceDPS(base, fwd, p, guidance_clip=50.0)
    pgdm = AnalyticGuidanceDPS(base, fwd, p, guidance_clip=50.0,
                               guidance="pgdm")
    out_d = np.asarray(dps.apply_a(params, x, y, t))
    out_p = np.asarray(pgdm.apply_a(params, x, y, t))
    assert np.all(np.isfinite(out_p))
    assert not np.allclose(out_d, out_p)

    # pgdm's variance inflation shrinks the guidance at large t
    g = base.sde.base.g(t)
    from dmip_tpu import nets
    s_prior = nets.prior_mlp_apply(params["prior"], x, t)
    lik_d = np.linalg.norm(np.asarray(out_d / g - s_prior), axis=-1)
    lik_p = np.linalg.norm(np.asarray(out_p / g - s_prior), axis=-1)
    assert lik_p.mean() <= lik_d.mean() + 1e-6


def test_analytic_guidance_dps_pallas_method_validation(key):
    """method='pallas' on AnalyticGuidanceDPS requires guidance='dps' AND
    surrogate weights (the fused kernel, ops/dps_kernel.py, bakes in the
    surrogate's VJPs); 'auto' off-TPU stays on the XLA path; unknown
    methods still raise (advisor round-2 finding)."""
    from dmip_tpu.models import AnalyticGuidanceDPS

    fwd, p = scat.load_forward_model()
    base = PosteriorDiffusionEstimator(xdim=3, ydim=23, hidden_layers=HID)
    params = base.init(key)
    kx, kd = jax.random.split(key)
    x = scat.sample_prior(kx, 4, p["lambd_bd"])
    y = scat.noisy_forward(kd, fwd, x, p["a"], p["b"])[0]

    no_weights = AnalyticGuidanceDPS(base, fwd, p, guidance_clip=5.0)
    with pytest.raises(ValueError, match="surrogate_weights"):
        no_weights.sample(params, key, y, 8, 2, method="pallas")

    pgdm = AnalyticGuidanceDPS(
        base, fwd, p, guidance_clip=5.0, guidance="pgdm",
        surrogate_weights=scat.load_surrogate_weights(),
    )
    with pytest.raises(ValueError, match="heun"):
        pgdm.sample(params, key, y, 8, 2, method="heun")

    # 'auto' on CPU routes to XLA even with weights present
    ag = AnalyticGuidanceDPS(
        base, fwd, p, guidance_clip=5.0,
        surrogate_weights=scat.load_surrogate_weights(),
    )
    out = ag.sample(params, key, y, 8, 2, method="auto")
    assert out.shape == (8, 3)
