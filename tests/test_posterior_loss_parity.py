"""DPS PosteriorLoss parity with the reference autograd graph.

Fresh torch mirror of the published math (losses.py:293-386): Tweedie
x_0, three VJPs through the forward model at x_0, three VHPs through the
prior net at x_t, detached likelihood target (create_graph=False).  Checks
loss values AND parameter gradients (the gradient check pins down the
stop_gradient semantics).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dmip_tpu.losses import posterior_loss
from dmip_tpu.nets import mlp_init, mlp_apply, prior_mlp_apply, score_mlp_apply
from dmip_tpu.sde import VPSDE

XDIM, YDIM, HID = 3, 4, (8, 8)
A_ERR, B_ERR, LAM = 0.2, 0.01, 0.5


@pytest.fixture(scope="module")
def setup():
    k = jax.random.split(jax.random.PRNGKey(3), 7)
    prior = mlp_init(k[0], XDIM + 1, XDIM, HID)
    lik = mlp_init(k[1], XDIM + YDIM + 1, XDIM, HID)
    fwd = mlp_init(k[2], XDIM, YDIM, (16,))
    B = 6
    x = jax.random.normal(k[3], (B, XDIM))
    y = jax.random.normal(k[4], (B, YDIM))
    eps = jax.random.normal(k[5], (B, XDIM))
    t = 0.1 + 0.8 * jax.random.uniform(k[6], (B, 1))
    return prior, lik, fwd, x, y, eps, t


def _fwd_single(fwd_params):
    return lambda xi: mlp_apply(fwd_params, xi[None], activation=jax.nn.relu)[0]


def _jax_loss(setup_vals):
    prior, lik, fwd, x, y, eps, t = setup_vals
    sde = VPSDE()

    def loss_of(prior_p, lik_p):
        return posterior_loss(
            lambda p, xx, tt: prior_mlp_apply(p, xx, tt),
            lambda p, xx, yy, tt: score_mlp_apply(p, xx, yy, tt),
            prior_p, lik_p, sde, _fwd_single(fwd), x, y, eps, t,
            a=A_ERR, b=B_ERR, lam=LAM,
        )[0]

    return loss_of


def _torch_loss_and_grads(setup_vals):
    import torch

    prior, lik, fwd, x, y, eps, t = setup_vals

    def to_t(params):
        return [
            (torch.tensor(np.asarray(w), requires_grad=True),
             torch.tensor(np.asarray(b), requires_grad=True))
            for w, b in params
        ]

    tp, tl = to_t(prior), to_t(lik)
    tf = [(torch.tensor(np.asarray(w)), torch.tensor(np.asarray(b)))
          for w, b in fwd]

    def net(layers, inp, act):
        h = inp
        for w, b in layers[:-1]:
            h = act(h @ w + b)
        w, b = layers[-1]
        return h @ w + b

    xx = torch.tensor(np.asarray(x))
    yy = torch.tensor(np.asarray(y))
    ee = torch.tensor(np.asarray(eps))
    tt = torch.tensor(np.asarray(t))

    bmin, bmax = 0.1, 20.0
    int_beta = 0.5 * (bmax - bmin) * tt**2 + bmin * tt
    alpha = torch.exp(-0.5 * int_beta)
    std = torch.sqrt(1.0 - torch.exp(-int_beta))

    x_t = (alpha * xx + std * ee).requires_grad_()
    s_prior = net(tp, torch.cat([x_t, tt], 1), torch.tanh)
    s_lik = net(tl, torch.cat([x_t, yy, tt], 1), torch.tanh)
    prior_loss = 0.5 * torch.sum((s_prior * std + ee) ** 2, 1)

    x_0 = (x_t + std**2 * s_prior) / alpha
    # re-expose x_0 as a grad target (torch.autograd.grad w.r.t. non-leaf)
    f_x = net(tf, x_0, torch.relu)
    prefactor = (A_ERR * f_x) ** 2 + B_ERR**2
    v1 = f_x / prefactor
    v2 = (yy - f_x) / prefactor
    # corrected v3 (reference bug SURVEY.md §2.3.13 uses /prefactor, which
    # has ~190% error vs the true likelihood gradient; see
    # test_likelihood_target_matches_autodiff below)
    v3 = (yy - f_x) ** 2 * f_x / prefactor**2
    vjp1 = torch.autograd.grad(f_x, x_0, v1, retain_graph=True)[0]
    vjp2 = torch.autograd.grad(f_x, x_0, v2, retain_graph=True)[0]
    vjp3 = torch.autograd.grad(f_x, x_0, v3, retain_graph=True)[0]
    vhp1 = torch.autograd.grad(s_prior, x_t, vjp1, retain_graph=True)[0]
    vhp2 = torch.autograd.grad(s_prior, x_t, vjp2, retain_graph=True)[0]
    vhp3 = torch.autograd.grad(s_prior, x_t, vjp3, retain_graph=True)[0]
    sig2 = std**2
    target = (
        -(A_ERR**2) * (sig2 * vhp1 + vjp1)
        + sig2 * vhp2 + vjp2
        + A_ERR**2 * (sig2 * vhp3 + vjp3)
    )
    lik_loss = torch.sum((alpha * s_lik - target) ** 2, 1)
    loss = torch.mean(prior_loss + LAM * lik_loss)
    loss.backward()
    grads_lik = [(w.grad.numpy(), b.grad.numpy()) for w, b in tl]
    grads_prior = [(w.grad.numpy(), b.grad.numpy()) for w, b in tp]
    return float(loss.detach()), grads_prior, grads_lik


def test_posterior_loss_value_and_grad_parity(setup):
    loss_of = _jax_loss(setup)
    prior, lik = setup[0], setup[1]
    jax_loss = float(loss_of(prior, lik))
    torch_loss, t_gp, t_gl = _torch_loss_and_grads(setup)
    np.testing.assert_allclose(jax_loss, torch_loss, rtol=2e-4)

    g_prior, g_lik = jax.grad(loss_of, argnums=(0, 1))(prior, lik)
    for (jw, jb), (tw, tb) in zip(g_lik, t_gl):
        np.testing.assert_allclose(jw, tw, rtol=5e-3, atol=2e-6)
        np.testing.assert_allclose(jb, tb, rtol=5e-3, atol=2e-6)
    for (jw, jb), (tw, tb) in zip(g_prior, t_gp):
        np.testing.assert_allclose(jw, tw, rtol=5e-3, atol=2e-6)


def test_likelihood_target_matches_autodiff():
    """At sigma -> 0 (x_0 = x_t, no Hessian term) the likelihood target must
    equal grad_x log N(y; f(x), (a f)^2 + b^2) computed by autodiff.  The
    reference's v3 = (y-f)^2 f / prefactor (losses.py:358) fails this with
    ~190% relative error; the corrected /prefactor^2 is exact
    (reference bug SURVEY.md §2.3.13)."""
    from dmip_tpu.problems import scatterometry as scat

    fwd, fp = scat.load_forward_model()
    a, b = fp["a"], fp["b"]
    key = jax.random.PRNGKey(0)
    x = jax.random.uniform(key, (4, 3)) * 2 - 1
    y = fwd(x[:1])[0] + 0.05 * jax.random.normal(
        jax.random.fold_in(key, 1), (23,)
    )

    def loglik(xi):
        f = fwd(xi[None])[0]
        var = (a * f) ** 2 + b**2
        return jnp.sum(-0.5 * (y - f) ** 2 / var - 0.5 * jnp.log(var))

    grad_true = jax.vmap(jax.grad(loglik))(x)

    def target(xi):
        f, vjp = jax.vjp(lambda z: fwd(z[None])[0], xi)
        pref = (a * f) ** 2 + b**2
        v1 = f / pref
        v2 = (y - f) / pref
        v3 = (y - f) ** 2 * f / pref**2
        return -(a**2) * vjp(v1)[0] + vjp(v2)[0] + a**2 * vjp(v3)[0]

    t_fix = jax.vmap(target)(x)
    np.testing.assert_allclose(np.asarray(t_fix), np.asarray(grad_true),
                               rtol=1e-4, atol=1e-5)
