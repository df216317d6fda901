"""Unit tests for the GT-half-swap scorer's verdict logic (tools/gt_half_swap)."""

import sys
import os

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from tools import gt_half_swap as hs


def _cols(d_mean, noise=0.002, n=100, seed=0):
    """Synthetic per-condition columns with a fixed ref-vs-snf mean delta."""
    rng = np.random.default_rng(seed)
    base = 1.0 + 0.5 * rng.random(n)
    d = d_mean + 0.01 * rng.standard_normal(n)
    c = {}
    c["kl_snf_A"] = base + noise * rng.standard_normal(n)
    c["kl_snf_B"] = base + noise * rng.standard_normal(n)
    c["kl_cde_A"] = base + 0.08
    c["kl_cde_B"] = base + 0.08
    c["kl_ref_A"] = c["kl_snf_A"] + d + noise * rng.standard_normal(n)
    c["kl_ref_B"] = c["kl_snf_B"] + d + noise * rng.standard_normal(n)
    c["kl_AB"] = base + noise * rng.standard_normal(n)
    return c


def test_report_stable_edge(capsys):
    """A consistent +0.05 deficit across halves is called STABLE."""
    hs.report(_cols(0.05), "synthetic")
    out = capsys.readouterr().out
    assert "STABLE across GT halves" in out
    assert "SNF wins 100/100" in out


def test_report_noise_level_edge(capsys):
    """Per-condition deltas that churn sign at GT-noise scale are called
    inside GT-resampling noise."""
    rng = np.random.default_rng(1)
    c = _cols(0.0)
    # deltas entirely noise: independent across halves, zero mean
    n = 100
    c["kl_ref_A"] = c["kl_snf_A"] + 0.003 * rng.standard_normal(n)
    c["kl_ref_B"] = c["kl_snf_B"] + 0.003 * rng.standard_normal(n)
    hs.report(c, "noise")
    out = capsys.readouterr().out
    assert "inside GT-resampling noise" in out


def test_model_hist_fn_sums_repeats(key=None):
    """The per-condition histogram accumulates HALF repeats of samples."""
    import jax
    import jax.numpy as jnp

    calls = []

    def fake_sample(k, y):
        calls.append(1)
        return jnp.zeros((10, 3))  # all samples in one central bin

    f = hs.model_hist_fn(fake_sample)
    keys = jnp.stack([jax.random.PRNGKey(i) for i in range(hs.HALF)])
    h = f(keys, jnp.zeros(23))
    assert float(h.sum()) == 10 * hs.HALF
