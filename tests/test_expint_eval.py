"""tools/expint_eval.py glue + the eval_method config plumbing.

The NFE-efficiency experiment (expint vs EM-200 at the full reference
protocol) lives in tools/expint_eval.py; these tests pin its settings
grammar and that evaluate_linear(method='expint:...') — the path the new
``eval_method``/``eval_num_steps`` config keys in both mains select —
drives the exponential integrator through the whole harness.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dmip_tpu.evaluate import evaluate_linear
from dmip_tpu.models import CDE
from dmip_tpu.problems import LinearForwardProblem
from tools.expint_eval import nfe_of, parse_settings


@pytest.fixture
def key():
    return jax.random.PRNGKey(3)


def test_parse_settings_grammar():
    assert parse_settings("auto@200,expint:sde:1@32,heun@40") == [
        ("auto", 200), ("expint:sde:1", 32), ("heun", 40)]


def test_nfe_accounting():
    # expint appends one exact denoise net call; heun is 2 evals per step.
    assert nfe_of("auto", 200) == 200
    assert nfe_of("expint:sde:1", 32) == 33
    assert nfe_of("expint:ode:2", 16) == 17
    assert nfe_of("heun", 40) == 80


def test_evaluate_linear_expint_method_plumbed(key):
    """evaluate_linear(method='expint:sde:1') at a 16-call NFE budget still
    nails the analytic posterior with an exact score (the eval_method
    config-key path in mains/main_diffusion_linear.py)."""
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
    kl, nlpd, _ = evaluate_linear(
        model, (), prob, ys, key, n_samples_x=10_000, n_repeats=2,
        num_steps=16, verbose=False, mesh=None, method="expint:sde:1",
    )
    assert np.isfinite(kl) and kl < 0.2, kl
    assert np.isfinite(nlpd)
