"""One-time measurement of PyTorch-reference-style TRAINING throughput.

Reimplements (fresh, from the published behavior) the reference's per-batch
training pattern for the two headline objectives on the linear problem's
shapes (xdim=ydim=2, 512x3 tanh MLP, batch 1000, 90 batches/epoch):

  * DSM      — CDE.train_epoch with DSMLoss (models/diffusion.py:74-105,
               losses.py:42-53): one forward + backward per batch.
  * PINNLoss — DSM + lam2*IC + lam*ScoreFPE (losses.py:168-242), with the
               reference's derivative pattern: per-dimension
               ``torch.autograd.grad`` loops for the divergence
               (losses.py:14-18) and ds/dt (losses.py:20-26), plus the
               spatial grad of the FPE bracket (losses.py:89-90,
               create_graph=False).

t is drawn uniformly in [eps, T] instead of the debiased truncated-q draw —
identical tensor shapes and op counts, so throughput is unaffected.

The result is cached in torch_train_baseline.json and consumed by
``bench.py --train`` as the ``vs_baseline`` denominator.

Usage: python benchmarks/baseline_torch_train.py [--epochs 3] [--batches 90]
"""

import argparse
import json
import math
import os
import time

import torch

T = 1.0
BETA_MIN, BETA_MAX = 0.1, 20.0
T_EPS = 1e-5


def build_net(xdim=2, ydim=2, hidden=(512, 512, 512)):
    layers = []
    dims = [xdim + ydim + 1, *hidden]
    for i in range(len(dims) - 1):
        layers += [torch.nn.Linear(dims[i], dims[i + 1]), torch.nn.Tanh()]
    layers += [torch.nn.Linear(hidden[-1], xdim)]
    return torch.nn.Sequential(*layers)


def vp_terms(t):
    """VP-SDE mean/std/beta/g at t (sdes.py closed forms)."""
    b = BETA_MIN * t + 0.5 * (BETA_MAX - BETA_MIN) * t**2
    mean = torch.exp(-0.5 * b)
    std = torch.sqrt(1.0 - torch.exp(-b))
    beta = BETA_MIN + (BETA_MAX - BETA_MIN) * t
    g = beta.sqrt()
    return mean, std, beta, g


def dsm_batch(net, opt, x, y):
    n = x.shape[0]
    t = torch.rand(n, 1) * (T - T_EPS) + T_EPS
    mean, std, beta, g = vp_terms(t)
    eps = torch.randn_like(x)
    x_t = mean * x + std * eps
    s = net(torch.cat([x_t, y, t], dim=1)) / g
    loss = ((s * std + eps) ** 2).sum(1).mean() / 2
    opt.zero_grad()
    loss.backward()
    opt.step()
    return float(loss.detach())


def score_posterior_linear(x, y, scale=0.3, noise_std=math.sqrt(0.3)):
    """Analytic posterior score of the linear-Gaussian toy (timing stand-in,
    same cost class as the reference's problem-specific callable)."""
    prec = 1.0 / noise_std**2
    sigma_inv = 1.0 + prec * scale**2
    mu = (prec * scale * y) / sigma_inv
    return -(x - mu) * sigma_inv


def pinn_batch(net, opt, x, y, lam=0.1, lam2=1.0):
    n, d = x.shape
    t = (torch.rand(n, 1) * (T - T_EPS) + T_EPS).requires_grad_(True)
    mean, std, beta, g = vp_terms(t)
    eps = torch.randn_like(x)
    x_t = (mean * x + std * eps).detach().requires_grad_(True)

    s = net(torch.cat([x_t, y, t], dim=1)) / g

    # DSM data term
    dsm = ((s * std + eps) ** 2).sum(1).mean() / 2

    # exact divergence: per-dimension autograd loop (reference losses.py:14-18)
    div = 0.0
    for i in range(d):
        div = div + torch.autograd.grad(
            s[..., i], x_t, torch.ones_like(s[..., i]),
            create_graph=True, retain_graph=True,
        )[0][..., i : i + 1]

    # ds/dt: per-output-dim loop (reference batch_gradient, losses.py:20-26)
    ds_dt = torch.zeros_like(s)
    for i in range(d):
        ds_dt[:, i] = torch.autograd.grad(
            s[:, i].sum(), t, retain_graph=True, create_graph=True
        )[0].view(-1)

    bracket = div + s.pow(2).sum(1, keepdim=True) \
        + (x_t[:, None, :] @ s[:, :, None]).view(-1, 1)
    grad_x = torch.autograd.grad(
        bracket, x_t, grad_outputs=torch.ones_like(bracket), retain_graph=True
    )[0]
    pde = (ds_dt - 0.5 * beta * grad_x).abs().mean(1).mean()

    # initial condition at t ~ 0
    t0 = torch.full((n, 1), T_EPS)
    _, _, _, g0 = vp_terms(t0)
    s0 = net(torch.cat([x, y, t0], dim=1)) / g0
    ic = (s0 - score_posterior_linear(x, y)).abs().sum(1).mean()

    loss = dsm + lam2 * ic + lam * pde
    opt.zero_grad()
    loss.backward()
    opt.step()
    return float(loss.detach())


def time_epochs(step_fn, net, epochs, batches, batch_size=1000):
    opt = torch.optim.Adam(net.parameters(), lr=1e-4)
    torch.manual_seed(0)
    x_all = torch.randn(batches * batch_size, 2)
    y_all = 0.3 * x_all + math.sqrt(0.3) * torch.randn_like(x_all)
    step_fn(net, opt, x_all[:1000], y_all[:1000])  # warmup
    t0 = time.time()
    for _ in range(epochs):
        for k in range(batches):
            sl = slice(k * batch_size, (k + 1) * batch_size)
            step_fn(net, opt, x_all[sl], y_all[sl])
    return epochs / (time.time() - t0)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--epochs", type=int, default=3)
    p.add_argument("--batches", type=int, default=90)
    p.add_argument("--out", default=os.path.join(os.path.dirname(__file__),
                                                 "torch_train_baseline.json"))
    args = p.parse_args()

    torch.manual_seed(0)
    result = {
        "device": "cpu" if not torch.cuda.is_available() else "cuda",
        "torch_version": torch.__version__,
        "batches_per_epoch": args.batches,
        "batch_size": 1000,
    }
    for name, fn in (("dsm", dsm_batch), ("pinn", pinn_batch)):
        net = build_net()
        eps_per_s = time_epochs(fn, net, args.epochs, args.batches)
        result[f"{name}_epochs_per_sec"] = eps_per_s
        result[f"{name}_steps_per_sec"] = eps_per_s * args.batches
        print(f"{name}: {eps_per_s:.3f} epochs/s "
              f"({eps_per_s * args.batches:.1f} steps/s)", flush=True)
    with open(args.out, "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
