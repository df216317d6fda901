"""Loss-machinery tests.

The gold test here mirrors the reference's autograd graph in PyTorch (CPU),
built fresh from the published math — NOT copied code — and checks our
JAX transform composition (jacfwd divergence, total-t jvp, reverse-over-
forward grad_x) reproduces it to numerical tolerance on random nets.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import dmip_tpu.losses as L
from dmip_tpu.nets import mlp_init, score_mlp_apply
from dmip_tpu.sde import VPSDE

XDIM, YDIM, HID = 2, 2, (16, 16)


@pytest.fixture(scope="module")
def setup():
    key = jax.random.PRNGKey(42)
    k1, k2, k3, k4, k5 = jax.random.split(key, 5)
    params = mlp_init(k1, XDIM + YDIM + 1, XDIM, HID)
    B = 8
    x = jax.random.normal(k2, (B, XDIM))
    y = jax.random.normal(k3, (B, YDIM))
    eps = jax.random.normal(k4, (B, XDIM))
    t = 0.05 + 0.9 * jax.random.uniform(k5, (B, 1))
    return params, x, y, eps, t


def _apply(params, z, cond, t):
    return score_mlp_apply(params, z, cond, t)


# ---------------------------------------------------------------------------
# Pure-JAX sanity checks
# ---------------------------------------------------------------------------


def test_dsm_loss_formula(key):
    s = jax.random.normal(key, (4, 3))
    std = jnp.full((4, 1), 0.5)
    target = jnp.ones((4, 3))
    out = L.dsm_loss(s, std, target)
    expected = 0.5 * np.sum((np.asarray(s) * 0.5 + 1.0) ** 2, axis=1)
    np.testing.assert_allclose(out, expected, rtol=1e-5)


def test_divergence_exact_linear_field():
    A = jnp.array([[2.0, 1.0], [0.5, -3.0]])
    f = lambda x: A @ x
    div = L.divergence_exact(f, jnp.array([0.3, -0.7]))
    np.testing.assert_allclose(div, -1.0, rtol=1e-6)


def test_divergence_hutchinson_unbiased(key):
    A = jnp.array([[2.0, 1.0], [0.5, -3.0]])
    f = lambda x: A @ x
    x = jnp.array([0.3, -0.7])
    keys = jax.random.split(key, 2000)
    vs = jax.vmap(lambda k: jax.random.rademacher(k, (2,), jnp.float32))(keys)
    ests = jax.vmap(lambda v: L.divergence_hutchinson(f, x, v))(vs)
    # Rademacher probes on a 2x2: v.(A^T v) = a11 + a22 + cross*(+-1) terms
    np.testing.assert_allclose(jnp.mean(ests), -1.0, atol=0.15)


def test_ds_dt_matches_finite_difference(setup):
    params, x, y, eps, t = setup
    sde = VPSDE()
    i = 3
    fns = L.make_score_fns(_apply, params, sde, x[i], eps[i], y[i], t[i, 0])
    ds = L._ds_dt(fns, t[i, 0])
    h = 1e-3
    fd = (fns.s_of_t(t[i, 0] + h) - fns.s_of_t(t[i, 0] - h)) / (2 * h)
    np.testing.assert_allclose(ds, fd, rtol=2e-2, atol=2e-3)


def test_score_fpe_zero_for_true_gaussian_score():
    """For the pure forward diffusion of N(0, I) the true marginal score
    s(x,t) = -x / (alpha^2 + sigma^2) = -x satisfies the Score-FPE with zero
    residual in its PARTIAL-t form; with total-t the extra transport term
    dx_t/dt . grad s must be accounted for.  We verify the machinery by
    plugging the stationary score s(x) = -x (time-independent for the VP SDE
    started at N(0,I)): div s = -d, ||s||^2 = ||x||^2, x.s = -||x||^2, so
    grad_x(div + ||s||^2 + x.s) = 0 and ds/dt = dx_t/dt * (-1).
    Residual = -dx_t/dt, which we compare against the analytic path
    derivative."""
    sde = VPSDE()

    def apply_a(params, z, cond, t):
        # net predicts g * score with score = -x
        tcol = jnp.broadcast_to(jnp.asarray(t).reshape(-1, 1), (z.shape[0], 1))
        return sde.g(tcol) * (-z)

    B = 5
    key = jax.random.PRNGKey(0)
    z0 = jax.random.normal(key, (B, 2))
    eps = jax.random.normal(jax.random.PRNGKey(1), (B, 2))
    t = jnp.full((B, 1), 0.4)

    vals = L.score_fpe_loss(apply_a, None, sde, z0, eps, None, t, metric="L1")
    # analytic: residual = -d/dt x_t(t) = -(alpha'(t) z0 + std'(t) eps)
    tt = 0.4
    h = 1e-4
    alpha_p = (sde.mean_weight(tt + h) - sde.mean_weight(tt - h)) / (2 * h)
    std_p = (sde.std(tt + h) - sde.std(tt - h)) / (2 * h)
    res = -(alpha_p * z0 + std_p * eps)
    np.testing.assert_allclose(vals, jnp.mean(jnp.abs(res), axis=1), rtol=1e-2)


def test_cscore_fpe_metrics(setup):
    params, x, y, eps, t = setup
    sde = VPSDE()
    l2 = L.cscore_fpe_loss(_apply, params, sde, x, eps, y, t, metric="L2")
    l1 = L.cscore_fpe_loss(_apply, params, sde, x, eps, y, t, metric="L1")
    assert l2.shape == (x.shape[0],)
    assert np.all(np.asarray(l1) >= 0) and np.all(np.asarray(l2) >= 0)


def test_composite_losses_run_and_log(setup):
    params, x, y, eps, t = setup
    sde = VPSDE()
    ic = lambda xx, yy: -xx
    for fn, keys in (
        (L.dsm_pde_loss, {"PDE-Loss", "DSM-Loss"}),
        (L.pinn_loss, {"PDE-Loss", "Initial Condition", "DSM-Loss"}),
        (L.pinn2_loss, {"PDE-Loss", "Initial Condition", "DSM_eval"}),
    ):
        kwargs = dict(lam=0.1, pde_loss="FPE", pde_metric="L1")
        if fn is not L.dsm_pde_loss:
            kwargs.update(initial_condition=ic, lam2=0.5, ic_metric="L2")
        loss, info = fn(_apply, params, sde, x, y, x, eps, t, **kwargs)
        assert np.isfinite(float(loss))
        assert set(info.keys()) == keys


@pytest.mark.parametrize("metric", ["L1", "L2"])
def test_batched_impl_equals_vmap_impl(setup, metric):
    """The batched (MXU-friendly) FPE composition must agree exactly with
    the per-sample vmap reference composition."""
    params, x, y, eps, t = setup
    sde = VPSDE()
    a = L.score_fpe_loss(_apply, params, sde, x, eps, y, t, metric=metric,
                         impl="batched")
    b = L.score_fpe_loss(_apply, params, sde, x, eps, y, t, metric=metric,
                         impl="vmap")
    np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-6)
    a = L.cscore_fpe_loss(_apply, params, sde, x, eps, y, t, metric=metric,
                          impl="batched")
    b = L.cscore_fpe_loss(_apply, params, sde, x, eps, y, t, metric=metric,
                          impl="vmap")
    np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-6)


def test_batched_impl_hutchinson_equals_vmap(setup):
    params, x, y, eps, t = setup
    sde = VPSDE()
    k = jax.random.PRNGKey(9)
    a = L.score_fpe_loss(_apply, params, sde, x, eps, y, t, metric="L2",
                         divergence_method="hutchinson", probe_key=k,
                         impl="batched")
    b = L.score_fpe_loss(_apply, params, sde, x, eps, y, t, metric="L2",
                         divergence_method="hutchinson", probe_key=k,
                         impl="vmap")
    np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-6)


def test_hutchinson_path_runs(setup):
    params, x, y, eps, t = setup
    sde = VPSDE()
    vals = L.score_fpe_loss(
        _apply, params, sde, x, eps, y, t,
        metric="L2", divergence_method="hutchinson",
        probe_key=jax.random.PRNGKey(7),
    )
    assert vals.shape == (x.shape[0],)
    assert np.all(np.isfinite(np.asarray(vals)))


# ---------------------------------------------------------------------------
# Torch-mirror parity: reproduce the reference's autograd graph semantics
# ---------------------------------------------------------------------------


def _torch_reference_fpe(params, x, y, eps, t, metric="L1"):
    """Fresh torch implementation of DSM + ScoreFPE with the reference's
    graph: t requires_grad BEFORE x_t is built (total ds/dt), grad_x w.r.t.
    the non-leaf x_t, exact divergence via per-dim autograd loops."""
    import torch

    bmin, bmax = 0.1, 20.0
    tt = torch.tensor(np.asarray(t), requires_grad=True)
    xx = torch.tensor(np.asarray(x))
    yy = torch.tensor(np.asarray(y))
    ee = torch.tensor(np.asarray(eps))

    layers = []
    for w, b in params:
        layers.append(
            (torch.tensor(np.asarray(w)), torch.tensor(np.asarray(b)))
        )

    def net(inp):
        h = inp
        for w, b in layers[:-1]:
            h = torch.tanh(h @ w + b)
        w, b = layers[-1]
        return h @ w + b

    beta = bmin + (bmax - bmin) * tt
    int_beta = 0.5 * (bmax - bmin) * tt**2 + bmin * tt
    alpha = torch.exp(-0.5 * int_beta)
    var = 1.0 - torch.exp(-int_beta)
    std = torch.sqrt(var)
    g = torch.sqrt(beta)

    x_t = alpha * xx + std * ee
    x_t.retain_grad()
    s = net(torch.cat([x_t, yy, tt], dim=1)) / g

    # DSM
    dsm = 0.5 * torch.sum((s * std + ee) ** 2, dim=1)

    # exact divergence
    div = 0.0
    for i in range(s.shape[1]):
        gr = torch.autograd.grad(
            s[:, i], x_t, torch.ones_like(s[:, i]),
            create_graph=True, retain_graph=True,
        )[0][:, i : i + 1]
        div = div + gr

    # total ds/dt
    ds_dt = torch.zeros_like(s)
    for i in range(s.shape[1]):
        d = torch.autograd.grad(
            s[:, i].sum(), tt, retain_graph=True, create_graph=True
        )[0]
        ds_dt[:, i] = d.view(-1)

    quad = div + torch.sum(s**2, dim=1, keepdim=True) + torch.sum(
        x_t * s, dim=1, keepdim=True
    )
    grad_x = torch.autograd.grad(
        quad, x_t, torch.ones_like(div), retain_graph=True
    )[0]

    res = ds_dt - 0.5 * beta * grad_x
    if metric == "L1":
        pde = torch.mean(torch.abs(res), dim=1)
    else:
        pde = torch.mean(res**2, dim=1)
    return dsm.detach().numpy(), pde.detach().numpy()


@pytest.mark.parametrize("metric", ["L1", "L2"])
def test_fpe_parity_with_torch_reference_graph(setup, metric):
    params, x, y, eps, t = setup
    sde = VPSDE()
    torch_dsm, torch_pde = _torch_reference_fpe(params, x, y, eps, t, metric)

    jax_pde = L.score_fpe_loss(_apply, params, sde, x, eps, y, t, metric=metric)
    z_t = sde.diffuse(t, x, eps)
    score = _apply(params, z_t, y, t) / sde.g(t)
    jax_dsm = L.dsm_loss(score, sde.std(t), eps)

    np.testing.assert_allclose(jax_dsm, torch_dsm, rtol=2e-4, atol=1e-5)
    np.testing.assert_allclose(jax_pde, torch_pde, rtol=2e-3, atol=1e-4)


def _torch_reference_cscore(params, x, y, eps, t, metric="L2"):
    import torch

    bmin, bmax = 0.1, 20.0
    tt = torch.tensor(np.asarray(t), requires_grad=True)
    xx = torch.tensor(np.asarray(x))
    yy = torch.tensor(np.asarray(y))
    ee = torch.tensor(np.asarray(eps))
    layers = [(torch.tensor(np.asarray(w)), torch.tensor(np.asarray(b))) for w, b in params]

    def net(inp):
        h = inp
        for w, b in layers[:-1]:
            h = torch.tanh(h @ w + b)
        w, b = layers[-1]
        return h @ w + b

    beta = bmin + (bmax - bmin) * tt
    int_beta = 0.5 * (bmax - bmin) * tt**2 + bmin * tt
    alpha = torch.exp(-0.5 * int_beta)
    std = torch.sqrt(1.0 - torch.exp(-int_beta))
    g = torch.sqrt(beta)
    x_t = alpha * xx + std * ee
    s = net(torch.cat([x_t, yy, tt], dim=1)) / g

    ds_dt = torch.zeros_like(s)
    for i in range(s.shape[1]):
        d = torch.autograd.grad(
            s[:, i].sum(), tt, retain_graph=True, create_graph=True
        )[0]
        ds_dt[:, i] = d.view(-1)
    u = 0.5 * ee * beta * alpha**2
    res = std**3 * ds_dt - u
    if metric == "L2":
        return torch.sum(res**2, dim=1).detach().numpy()
    return torch.sum(torch.abs(res), dim=1).detach().numpy()


def test_cscore_parity_with_torch_reference_graph(setup):
    params, x, y, eps, t = setup
    sde = VPSDE()
    torch_val = _torch_reference_cscore(params, x, y, eps, t, "L2")
    jax_val = L.cscore_fpe_loss(_apply, params, sde, x, eps, y, t, metric="L2")
    np.testing.assert_allclose(jax_val, torch_val, rtol=3e-3, atol=1e-5)


def _torch_fpe_param_grads(params, x, y, eps, t, metric="L1"):
    """Parameter gradients of mean(DSM + ScoreFPE) under the reference's
    exact autograd graph (grad_x via create_graph=False => detached)."""
    import torch

    bmin, bmax = 0.1, 20.0
    tt = torch.tensor(np.asarray(t), requires_grad=True)
    xx = torch.tensor(np.asarray(x))
    yy = torch.tensor(np.asarray(y))
    ee = torch.tensor(np.asarray(eps))
    layers = [
        (torch.tensor(np.asarray(w), requires_grad=True),
         torch.tensor(np.asarray(b), requires_grad=True))
        for w, b in params
    ]

    def net(inp):
        h = inp
        for w, b in layers[:-1]:
            h = torch.tanh(h @ w + b)
        w, b = layers[-1]
        return h @ w + b

    beta = bmin + (bmax - bmin) * tt
    int_beta = 0.5 * (bmax - bmin) * tt**2 + bmin * tt
    alpha = torch.exp(-0.5 * int_beta)
    std = torch.sqrt(1.0 - torch.exp(-int_beta))
    g = torch.sqrt(beta)
    x_t = alpha * xx + std * ee
    x_t.retain_grad()
    s = net(torch.cat([x_t, yy, tt], dim=1)) / g
    dsm = 0.5 * torch.sum((s * std + ee) ** 2, dim=1)

    div = 0.0
    for i in range(s.shape[1]):
        gr = torch.autograd.grad(
            s[:, i], x_t, torch.ones_like(s[:, i]),
            create_graph=True, retain_graph=True,
        )[0][:, i : i + 1]
        div = div + gr
    ds_dt = torch.zeros_like(s)
    for i in range(s.shape[1]):
        d = torch.autograd.grad(
            s[:, i].sum(), tt, retain_graph=True, create_graph=True
        )[0]
        ds_dt[:, i] = d.view(-1)
    quad = div + torch.sum(s**2, dim=1, keepdim=True) + torch.sum(
        x_t * s, dim=1, keepdim=True
    )
    # create_graph defaults to False -> grad_x is DETACHED (reference
    # losses.py:89-90)
    grad_x = torch.autograd.grad(
        quad, x_t, torch.ones_like(div), retain_graph=True
    )[0]
    res = ds_dt - 0.5 * beta * grad_x
    pde = torch.mean(torch.abs(res) if metric == "L1" else res**2, dim=1)
    loss = torch.mean(dsm + 0.3 * pde)
    loss.backward()
    return float(loss.detach()), [
        (w.grad.numpy(), b.grad.numpy()) for w, b in layers
    ]


@pytest.mark.parametrize("metric", ["L1", "L2"])
def test_fpe_parameter_gradient_parity_with_torch(setup, metric):
    """The DEFAULT (detach_grad_x=True) path must match the reference's
    parameter gradients, not just loss values — the reference's grad_x term
    is constant during backprop (create_graph=False)."""
    params, x, y, eps, t = setup
    sde = VPSDE()
    torch_loss, torch_grads = _torch_fpe_param_grads(params, x, y, eps, t,
                                                     metric)

    def jax_loss(p):
        z_t = sde.diffuse(t, x, eps)
        score = _apply(p, z_t, y, t) / sde.g(t)
        dsm = L.dsm_loss(score, sde.std(t), eps)
        pde = L.score_fpe_loss(_apply, p, sde, x, eps, y, t, metric=metric)
        return jnp.mean(dsm + 0.3 * pde)

    np.testing.assert_allclose(float(jax_loss(params)), torch_loss, rtol=3e-4)
    grads = jax.grad(jax_loss)(params)
    for (jw, jb), (tw, tb) in zip(grads, torch_grads):
        np.testing.assert_allclose(jw, tw, rtol=5e-3, atol=3e-6)
        np.testing.assert_allclose(jb, tb, rtol=5e-3, atol=3e-6)


def test_pgdm_likelihood_score_small_t_matches_fixed_cov_grad(key):
    """At t->0 (alpha~1, sigma~0, r2~0) the ΠGDM guidance
    (losses.pgdm_likelihood_score) reduces to the gradient of the
    fixed-diagonal heteroscedastic log-likelihood at x_t itself."""
    import jax.numpy as jnp
    from dmip_tpu import losses as L
    from dmip_tpu.sde import VPSDE

    base = VPSDE()
    a_p, b_p = 0.2, 0.1
    k1, k2, k3 = jax.random.split(key, 3)
    W = jax.random.normal(k1, (5, 3)) * 0.5

    def forward_fn(x):
        return jnp.tanh(W @ x) + 0.1 * (W @ x) ** 2

    # "prior net" with bounded output so Tweedie stays tame
    V = jax.random.normal(k2, (3, 3)) * 0.1
    prior_apply = lambda params, x, t: jnp.tanh(x @ params.T)

    x_t = jax.random.normal(k3, (4, 3)) * 0.5
    y = forward_fn(x_t[0]) + 0.05
    ys = jnp.tile(y, (4, 1))
    t = jnp.full((4, 1), 1e-4)

    got = L.pgdm_likelihood_score(
        prior_apply, V, base, forward_fn, x_t, ys, t, a=a_p, b=b_p
    )

    def fixed_cov_loglik(x, y_i):
        f0 = forward_fn(x)
        diag = (a_p * jax.lax.stop_gradient(f0)) ** 2 + b_p**2
        return -0.5 * jnp.sum((y_i - f0) ** 2 / diag)

    want = jax.vmap(jax.grad(fixed_cov_loglik))(x_t, ys)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-2, atol=2e-2)
    assert np.all(np.isfinite(np.asarray(got)))


def test_pgdm_woodbury_matches_dense_cholesky(key):
    """pgdm_likelihood_score's Woodbury solve (losses.py: 3x3 inner system)
    equals the dense (ydim, ydim) Cholesky formulation it replaced, at a
    generic mid-trajectory t where r2 is O(1)."""
    import jax.numpy as jnp
    from dmip_tpu import losses as L
    from dmip_tpu.sde import VPSDE

    base = VPSDE()
    a_p, b_p = 0.2, 0.01
    k1, k2, k3 = jax.random.split(key, 3)
    W = jax.random.normal(k1, (23, 3)) * 0.5

    def forward_fn(x):
        return jnp.tanh(W @ x) + 0.1 * (W @ x) ** 2

    V = jax.random.normal(k2, (3, 3)) * 0.1
    prior_apply = lambda params, x, t: jnp.tanh(x @ params.T)

    x_t = jax.random.normal(k3, (6, 3)) * 0.8
    ys = jnp.tile(forward_fn(x_t[0]) + 0.05, (6, 1))
    t = jnp.full((6, 1), 0.7)

    got = L.pgdm_likelihood_score(
        prior_apply, V, base, forward_fn, x_t, ys, t, a=a_p, b=b_p
    )

    std = base.std(t).reshape(6)
    alpha = base.mean_weight(t).reshape(6)
    r2 = std**2 / (alpha**2 + std**2)

    def per_sample_dense(xt_i, y_i, t_i, sig_i, al_i, r2_i):
        def x0_of(xt):
            s = prior_apply(V, xt[None], t_i)[0]
            return (xt + sig_i**2 * s) / al_i

        x0 = x0_of(xt_i)
        f0 = forward_fn(x0)
        jac = jax.jacfwd(forward_fn)(x0)
        cov = jnp.diag((a_p * f0) ** 2 + b_p**2) + r2_i * (jac @ jac.T)
        chol = jax.scipy.linalg.cho_factor(cov)

        def ell(xt):
            resid = y_i - forward_fn(x0_of(xt))
            return -0.5 * jnp.dot(resid, jax.scipy.linalg.cho_solve(chol, resid))

        return jax.grad(ell)(xt_i)

    want = jax.vmap(per_sample_dense)(x_t, ys, t.reshape(6), std, alpha, r2)
    # float32: with b=0.01 the inverse diagonal reaches 1e4, so the two
    # algebraically identical solves differ at the conditioning level.
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=3e-3, atol=1e-2)
