"""Flow tests: coupling invertibility, log-det vs autodiff, FrEIA parity,
INN/SNF training smoke + sampling."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dmip_tpu import flows


def test_coupling_invertibility(key):
    k1, k2, k3 = jax.random.split(key, 3)
    d, cdim = 3, 5
    params = flows.coupling_init(k1, d, cdim, 32)
    x = jax.random.normal(k2, (16, d))
    c = jax.random.normal(k3, (16, cdim))
    y, ld_f = flows.coupling_forward(params, x, c, d)
    x_rec, ld_i = flows.coupling_inverse(params, y, c, d)
    np.testing.assert_allclose(x_rec, x, atol=1e-5)
    np.testing.assert_allclose(ld_f, -ld_i, atol=1e-5)


def test_coupling_logdet_matches_autodiff_slogdet(key):
    k1, k2, k3 = jax.random.split(key, 3)
    d, cdim = 4, 2
    params = flows.coupling_init(k1, d, cdim, 16)
    x = jax.random.normal(k2, (3, d))
    c = jax.random.normal(k3, (3, cdim))
    _, ld = flows.coupling_forward(params, x, c, d)

    def single(xi, ci):
        f = lambda z: flows.coupling_forward(params, z[None], ci[None], d)[0][0]
        J = jax.jacfwd(f)(xi)
        return jnp.linalg.slogdet(J)[1]

    ld_auto = jax.vmap(single)(x, c)
    np.testing.assert_allclose(ld, ld_auto, rtol=1e-4, atol=1e-5)


def _torch_glow_block(params, clamp=1.4):
    """Test-local torch mirror of FrEIA 0.2's GLOWCouplingBlock math.

    Vendors the ~30 relevant lines of FrEIA/modules/coupling_layers.py at
    v0.2 (the version the reference pins, requirements.txt:31): the ATAN
    soft clamp is ``clamp * 0.636 * atan(s)`` (argument NOT divided by
    clamp), subnet2 acts first on (x2, c), subnet1 on (y1, c), and the
    reverse pass negates the per-coupling jacobians.  Weights are ported
    from a dmip_tpu coupling-param pytree.
    """
    import torch

    def subnet(p):
        def f(h):
            for w, b in p[:-1]:
                h = torch.relu(h @ torch.from_numpy(np.asarray(w))
                               + torch.from_numpy(np.asarray(b)))
            w, b = p[-1]
            return h @ torch.from_numpy(np.asarray(w)) + torch.from_numpy(
                np.asarray(b))
        return f

    subnet1, subnet2 = subnet(params["s1"]), subnet(params["s2"])

    def f_clamp(s):
        return clamp * 0.636 * torch.atan(s)

    def forward(x, c, d, rev=False):
        len1 = d // 2
        len2 = d - len1
        x1, x2 = x[:, :len1], x[:, len1:]
        if not rev:
            a2 = subnet2(torch.cat([x2, c], 1))
            s2, t2 = f_clamp(a2[:, :len1]), a2[:, len1:]
            y1 = torch.exp(s2) * x1 + t2
            a1 = subnet1(torch.cat([y1, c], 1))
            s1, t1 = f_clamp(a1[:, :len2]), a1[:, len2:]
            y2 = torch.exp(s1) * x2 + t1
            jac = s1.sum(1) + s2.sum(1)
        else:
            a1 = subnet1(torch.cat([x1, c], 1))
            s1, t1 = f_clamp(a1[:, :len2]), a1[:, len2:]
            y2 = (x2 - t1) * torch.exp(-s1)
            a2 = subnet2(torch.cat([y2, c], 1))
            s2, t2 = f_clamp(a2[:, :len1]), a2[:, len1:]
            y1 = (x1 - t2) * torch.exp(-s2)
            jac = -(s1.sum(1) + s2.sum(1))
        return torch.cat([y1, y2], 1), jac

    return forward


def test_coupling_matches_freia_v02_mirror(key):
    """Forward/inverse/log-det parity with the vendored FrEIA 0.2 torch
    mirror on shared weights (SURVEY §2.2's flagged verification)."""
    torch = pytest.importorskip("torch")

    k1, k2, k3 = jax.random.split(key, 3)
    d, cdim = 5, 3  # odd d exercises the uneven split (len1=2, len2=3)
    params = flows.coupling_init(k1, d, cdim, 32)
    x = jax.random.normal(k2, (16, d))
    c = jax.random.normal(k3, (16, cdim))

    y_j, ld_j = flows.coupling_forward(params, x, c, d)
    x_rec_j, ld_i_j = flows.coupling_inverse(params, y_j, c, d)

    mirror = _torch_glow_block(jax.device_get(params))
    xt = torch.from_numpy(np.asarray(x))
    ct = torch.from_numpy(np.asarray(c))
    with torch.no_grad():
        y_t, ld_t = mirror(xt, ct, d, rev=False)
        x_rec_t, ld_i_t = mirror(y_t, ct, d, rev=True)

    np.testing.assert_allclose(np.asarray(y_j), y_t.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(ld_j), ld_t.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(x_rec_j), x_rec_t.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(ld_i_j), ld_i_t.numpy(), atol=1e-5)


def test_inn_stack_matches_freia_v02_mirror(key):
    """Multi-block INN (the reference's create_INN graph) matches a chained
    v0.2 mirror: the ML-loss inputs (z, jac_inv) agree end to end."""
    torch = pytest.importorskip("torch")

    inn = flows.create_inn(3, 16, dimension=2, dimension_condition=2)
    k1, k2, k3 = jax.random.split(key, 3)
    params = inn.init(k1)
    x = jax.random.normal(k2, (8, 2))
    c = jax.random.normal(k3, (8, 2))

    z_j, ld_j = inn.inverse(params, x, c)

    zt = torch.from_numpy(np.asarray(x))
    ct = torch.from_numpy(np.asarray(c))
    ld_t = torch.zeros(8)
    with torch.no_grad():
        for p in reversed(params):
            mirror = _torch_glow_block(jax.device_get(p))
            zt, ld = mirror(zt, ct, 2, rev=True)
            ld_t = ld_t + ld
    np.testing.assert_allclose(np.asarray(z_j), zt.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(ld_j), ld_t.numpy(), atol=1e-5)


def test_inn_forward_inverse_roundtrip(key):
    inn = flows.create_inn(4, 32, dimension=2, dimension_condition=2)
    k1, k2, k3 = jax.random.split(key, 3)
    params = inn.init(k1)
    x = jax.random.normal(k2, (32, 2))
    c = jax.random.normal(k3, (32, 2))
    z, ld_f = inn.forward(params, x, c)
    x_rec, ld_i = inn.inverse(params, z, c)
    np.testing.assert_allclose(x_rec, x, atol=1e-4)
    np.testing.assert_allclose(ld_f, -ld_i, atol=1e-4)


def test_inn_trains_toward_conditional_gaussian(key):
    """Quick ML training on a linear-Gaussian task must reduce the loss and
    produce roughly correct conditional samples."""
    import optax

    from dmip_tpu.problems import LinearForwardProblem

    prob = LinearForwardProblem()
    inn = flows.create_inn(4, 64, dimension=2, dimension_condition=2)
    k1, k2, k3, k4 = jax.random.split(key, 4)
    params = inn.init(k1)
    x = jax.random.normal(k2, (4000, 2))
    y = prob.forward(x) + jnp.sqrt(prob.scale) * jax.random.normal(k3, (4000, 2))

    opt = optax.adam(1e-3)
    opt_state = opt.init(params)
    loss_fn = lambda p: flows.inn_ml_loss(inn, p, x, y)

    @jax.jit
    def step(params, opt_state):
        loss, g = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(g, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    loss0 = None
    for i in range(300):
        params, opt_state, loss = step(params, opt_state)
        if loss0 is None:
            loss0 = float(loss)
    assert float(loss) < loss0 - 0.5, (loss0, float(loss))

    y_q = jnp.array([0.8, -0.3])
    samples = inn.sample(params, k4, y_q, 20_000)
    mean, _cov = prob.posterior_moments(y_q)
    np.testing.assert_allclose(np.mean(np.asarray(samples), 0), mean, atol=0.25)


def test_snf_structure_matches_reference_builder():
    energy = lambda x, ys: 0.5 * jnp.sum(x**2, 1)
    snf = flows.create_snf(3, 16, energy, metr_steps_per_block=2,
                           dimension=2, dimension_condition=2)
    kinds = [type(l).__name__ for l in snf.layers]
    assert kinds == ["DeterministicLayer", "MCMCLayer"] * 3
    snf2 = flows.create_snf_last_layer(3, 16, energy, metr_steps_per_block=2,
                                       dimension=2, dimension_condition=2)
    kinds2 = [type(l).__name__ for l in snf2.layers]
    assert kinds2 == ["DeterministicLayer"] * 3 + ["MCMCLayer"]
    # MALA / Langevin layer selection
    snf3 = flows.create_snf(2, 16, energy, metr_steps_per_block=2,
                            dimension=2, dimension_condition=2,
                            langevin_prop=True, lang_steps=0)
    assert [type(l).__name__ for l in snf3.layers] == [
        "DeterministicLayer", "MALALayer"] * 2
    snf4 = flows.create_snf(2, 16, energy, metr_steps_per_block=2,
                            dimension=2, dimension_condition=2, lang_steps=2)
    assert [type(l).__name__ for l in snf4.layers] == [
        "DeterministicLayer", "LangevinLayer", "MCMCLayer"] * 2


def test_snf_forward_backward_and_training_smoke(key):
    import optax

    from dmip_tpu.problems import LinearForwardProblem

    prob = LinearForwardProblem()
    energy = lambda x, ys: prob.log_posterior(x, ys)[:, 0]
    snf = flows.create_snf(2, 16, energy, metr_steps_per_block=2,
                           dimension=2, dimension_condition=2, noise_std=0.4)
    k1, k2, k3, k4 = jax.random.split(key, 4)
    params = snf.init(k1)
    x = jax.random.normal(k2, (256, 2))
    ys = prob.forward(x)

    z, logdet = snf.backward(params, k3, x, ys)
    assert z.shape == (256, 2) and logdet.shape == (256,)
    assert np.all(np.isfinite(np.asarray(z)))

    loss = flows.snf_ml_loss(snf, params, k3, x, ys)
    assert np.isfinite(float(loss))

    # one gradient step must run (MCMC layers inside the graph)
    g = jax.grad(lambda p: flows.snf_ml_loss(snf, p, k3, x, ys))(params)
    flat = jax.tree_util.tree_leaves(g)
    assert all(np.all(np.isfinite(np.asarray(l))) for l in flat)

    samples = snf.sample(params, k4, ys[0], 128)
    assert samples.shape == (128, 2)
    assert np.all(np.isfinite(np.asarray(samples)))
