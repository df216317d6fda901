"""EnergyRefinedModel: exact-energy refinement of a diffusion proposal."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dmip_tpu.models import CDE, EnergyRefinedModel


@dataclasses.dataclass(frozen=True, eq=False)
class _FakeBase:
    """Stand-in 'diffusion model' drawing from a WRONG posterior N(0, 1.5^2);
    records the sampler kwargs it received."""

    xdim: int = 2
    ydim: int = 3
    sde: object = None

    def sample(self, params, key, y, num_samples=2000, num_steps=200,
               mean=0.0, std=1.0, dtype=jnp.float32, method="auto"):
        return 1.5 * jax.random.normal(key, (num_samples, self.xdim), dtype)

    def apply_a(self, params, z, cond, t):
        return -z


def _energy(x, ys_tiled):
    # true posterior is N(0, I) regardless of y
    return 0.5 * jnp.sum(x**2, axis=1)


def test_refinement_corrects_proposal_scale(key):
    """MH refinement at the exact energy pulls an over-dispersed proposal
    onto the target: sample std moves from 1.5 toward 1.0."""
    model = EnergyRefinedModel(
        _FakeBase(), _energy, refine_steps=200, kernel="mh", noise_std=0.4
    )
    y = jnp.zeros(3)
    x = jax.jit(
        lambda k: model.sample(None, k, y, num_samples=8000)
    )(key)
    std = float(np.asarray(x).std())
    assert abs(std - 1.0) < 0.08, std
    x_raw = _FakeBase().sample(None, key, y, 8000)
    assert abs(float(np.asarray(x_raw).std()) - 1.5) < 0.1


def test_mala_kernel_also_corrects(key):
    model = EnergyRefinedModel(
        _FakeBase(), _energy, refine_steps=60, kernel="mala",
        stepsize=0.05, lang_steps=1,
    )
    x = jax.jit(lambda k: model.sample(None, k, jnp.zeros(3), 8000))(key)
    assert abs(float(np.asarray(x).std()) - 1.0) < 0.08


def test_ula_kernel_converges_overdispersed(key):
    """ULA (no MH correction) on the N(0,1) target: the OU recursion
    x' = (1-h)x + sqrt(2h) eta has stationary var 1/(1 - h/2) — converged
    BUT over-dispersed by O(h).  At h=0.3 that's std ~1.084: clearly off
    the proposal's 1.5, clearly above the exact-kernel 1.0."""
    model = EnergyRefinedModel(
        _FakeBase(), _energy, refine_steps=100, kernel="ula", stepsize=0.3
    )
    x = jax.jit(lambda k: model.sample(None, k, jnp.zeros(3), 8000))(key)
    std = float(np.asarray(x).std())
    expected = (1.0 / (1.0 - 0.15)) ** 0.5
    assert abs(std - expected) < 0.05, (std, expected)
    assert std > 1.03  # the deliberate ULA over-dispersion is present


def test_annealed_refinement_corrects_proposal_scale(key):
    """anneal_from < 1 routes through mcmc.annealed_mh (SNF's lambda
    schedule): the chain still ends at lam=1, so the over-dispersed proposal
    is pulled onto the exact target.  (The lam<1 interpolation mixes in the
    standard-normal prior — which here EQUALS the target, so the endpoint
    statistics are the same as the plain chain's.)"""
    model = EnergyRefinedModel(
        _FakeBase(), _energy, refine_steps=200, kernel="mh", noise_std=0.4,
        anneal_from=0.5,
    )
    x = jax.jit(lambda k: model.sample(None, k, jnp.zeros(3), 8000))(key)
    assert abs(float(np.asarray(x).std()) - 1.0) < 0.08


def test_target_acc_adaptation_still_corrects(key):
    """Acceptance-targeted adaptation from a far-too-wide proposal std must
    still land the population on the exact target."""
    model = EnergyRefinedModel(
        _FakeBase(), _energy, refine_steps=200, kernel="mh", noise_std=4.0,
        target_acc=0.4,
    )
    x = jax.jit(lambda k: model.sample(None, k, jnp.zeros(3), 8000))(key)
    assert abs(float(np.asarray(x).std()) - 1.0) < 0.08


def test_refine_frac_samples_the_mixture(key):
    """frac=0.5 keeps half the raw N(0,1.5^2) proposal and refines half to
    N(0,1): population variance ~ 0.5*2.25 + 0.5*1.0 = 1.625."""
    model = EnergyRefinedModel(
        _FakeBase(), _energy, refine_steps=200, kernel="mh", noise_std=0.4,
        refine_frac=0.5,
    )
    x = jax.jit(lambda k: model.sample(None, k, jnp.zeros(3), 8000))(key)
    std = float(np.asarray(x).std())
    assert abs(std - 1.625**0.5) < 0.06, std


def test_smooth_tau_convolves_population(key):
    """One ULA step at stepsize tau on N(0,1) energy maps x -> (1-tau)x +
    sqrt(2 tau) xi: variance (1-tau)^2 sigma^2 + 2 tau.  With refine_steps=0
    the proposal stays the raw N(0, 1.5^2)."""
    tau = 0.02
    model = EnergyRefinedModel(
        _FakeBase(), _energy, refine_steps=0, smooth_tau=tau
    )
    x = jax.jit(lambda k: model.sample(None, k, jnp.zeros(3), 8000))(key)
    var = float(np.asarray(x).var())
    expect = (1 - tau) ** 2 * 1.5**2 + 2 * tau
    assert abs(var - expect) < 0.12, (var, expect)


def test_parity_tool_ckpt_fallback(monkeypatch, tmp_path):
    """When the gitignored checkpoint_xlong is absent, load_params falls
    back to the durable benchmarks/checkpoints/cde_500k archive."""
    import os, sys
    repo = os.path.join(os.path.dirname(__file__), "..")
    sys.path.insert(0, repo)
    import tools.refined_snf_parity as rsp
    from dmip_tpu.train import get_model_from_args

    model, _ = get_model_from_args(dict(rsp.TRIAL_CFG),
                                   {"xdim": 3, "ydim": 23})
    monkeypatch.chdir(repo)
    monkeypatch.setattr(rsp, "TRIAL_DIR", str(tmp_path / "missing"))
    params = rsp.load_params(model, jax.random.PRNGKey(0))
    leaves = jax.tree_util.tree_leaves(params)
    assert leaves and leaves[0].shape[0] == 27  # [x(3), y(23), t(1)] input


def test_parity_tool_config_grammar():
    """'kernel,steps,param[,frac[,tau]]' strings map onto the model knobs."""
    import os, sys
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from tools.refined_snf_parity import build

    base = _FakeBase()
    m, tag = build(base, _energy, "none,0,0")
    assert m is base and tag == "cde"
    m, tag = build(base, _energy, "none,0,0,1.0,0.0005")
    assert m.refine_steps == 0 and m.smooth_tau == 0.0005
    m, tag = build(base, _energy, "mh,20,0.2")
    assert (m.kernel, m.refine_steps, m.noise_std) == ("mh", 20, 0.2)
    assert tag == "mh20_0.2"
    m, tag = build(base, _energy, "mala,5,0.005,0.7,0.001")
    assert m.kernel == "mala" and m.stepsize == 0.005
    assert m.refine_frac == 0.7 and m.smooth_tau == 0.001
    assert tag == "mala5_0.005_f0.7_tau0.001"
    m, tag = build(base, _energy, "mh,20,0.2,anneal=0.5,acc=0.4")
    assert m.anneal_from == 0.5 and m.target_acc == 0.4
    assert m.refine_frac == 1.0 and tag == "mh20_0.2_a0.5_acc0.4"
    m, tag = build(base, _energy, "mh,30,0.2,anneal=0.5,afrac=0.5")
    assert m.anneal_from == 0.5 and m.anneal_frac == 0.5
    assert tag == "mh30_0.2_a0.5_af0.5"
    with pytest.raises(ValueError):
        build(base, _energy, "mh,20,0.2,bogus=1")


def test_zero_steps_is_base_sampler(key):
    model = EnergyRefinedModel(_FakeBase(), _energy, refine_steps=0)
    k_prop, _ = jax.random.split(key)
    x = model.sample(None, key, jnp.zeros(3), 500)
    x_base = _FakeBase().sample(None, k_prop, jnp.zeros(3), 500)
    np.testing.assert_array_equal(np.asarray(x), np.asarray(x_base))


def test_surface_delegation_and_validation(key):
    base = CDE(xdim=2, ydim=3, hidden_layers=(16,))
    params = base.init(key)
    model = EnergyRefinedModel(base, _energy, refine_steps=2)
    assert model.xdim == 2 and model.ydim == 3
    assert model.sde is base.sde
    z = jnp.ones((4, 2))
    c = jnp.ones((4, 3))
    t = jnp.zeros((4, 1))
    np.testing.assert_array_equal(
        np.asarray(model.apply_a(params, z, c, t)),
        np.asarray(base.apply_a(params, z, c, t)),
    )
    with pytest.raises(ValueError):
        EnergyRefinedModel(base, _energy, kernel="hmc")
    # annealed/tempered/adaptive options are MH-only
    with pytest.raises(ValueError):
        EnergyRefinedModel(base, _energy, kernel="mala", anneal_from=0.5)
    with pytest.raises(ValueError):
        EnergyRefinedModel(base, _energy, kernel="ula", target_acc=0.4)
    with pytest.raises(ValueError):
        EnergyRefinedModel(base, _energy, kernel="mala", anneal_frac=0.5)
    with pytest.raises(ValueError):
        EnergyRefinedModel(base, _energy, anneal_frac=0.0)


def test_refined_through_eval_harness(key, tmp_path):
    """The eval kernel jits model.sample; the refined model must pass
    through make_eval_y_scatterometry unchanged."""
    from dmip_tpu import evaluate

    base = CDE(xdim=3, ydim=4, hidden_layers=(16,))
    params = base.init(key)
    fwd = lambda x: jnp.tile(jnp.sum(x, -1, keepdims=True), (1, 4))
    fparams = {"a": 0.2, "b": 0.01, "lambd_bd": 1000.0}
    energy = lambda x, ys: 0.5 * jnp.sum(x**2, axis=1)
    model = EnergyRefinedModel(base, energy, refine_steps=3, noise_std=0.2)
    score_fn = lambda x, ys: -x
    eval_yr = evaluate.make_eval_y_scatterometry(
        model, fwd, fparams, score_fn, n_samples_x=64, num_steps=8, nbins=5,
    )
    out = eval_yr(params, key, jnp.zeros(4), jnp.zeros((64, 3)))
    assert np.isfinite(float(out["nll_model"]))
    assert out["x_pred"].shape == (64, 3)


def test_expint_proposal_plumbed_through_refined(key):
    """The composed round-5 flagship path: EnergyRefinedModel.sample must
    forward method='expint:...' and num_steps to the proposal sampler
    (tools/refined_snf_parity.py --method expint:sde:1 --num_steps 32)."""
    base = CDE(xdim=2, ydim=3, hidden_layers=(16,))
    params = base.init(key)
    model = EnergyRefinedModel(base, _energy, refine_steps=2, noise_std=0.2)
    y = jnp.zeros(3)
    x = model.sample(params, key, y, num_samples=256, num_steps=8,
                     method="expint:sde:1")
    assert x.shape == (256, 2)
    assert bool(jnp.all(jnp.isfinite(x)))
    # a different proposal method must change the output (it is actually used)
    x_em = model.sample(params, key, y, num_samples=256, num_steps=8,
                        method="xla")
    assert not np.allclose(np.asarray(x), np.asarray(x_em))
