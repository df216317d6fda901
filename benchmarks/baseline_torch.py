"""One-time measurement of the PyTorch-reference-style sampling throughput.

Reimplements (fresh, from the published behavior — models/diffusion.py:27-46)
the reference's Euler-Maruyama posterior sampler as a per-step Python loop
over torch ops, with the same 5->512x3->2 tanh MLP, and times it on this
host's torch device (CPU here; the reference's device policy is
cuda-if-available-else-cpu).  The result is cached in torch_baseline.json and
consumed by bench.py as the ``vs_baseline`` denominator.

Usage: python benchmarks/baseline_torch.py [--steps 20] [--samples 30000]
"""

import argparse
import json
import os
import time

import torch


def build_net(xdim=2, ydim=2, hidden=(512, 512, 512)):
    layers = []
    dims = [xdim + ydim + 1, *hidden]
    for i in range(len(dims) - 1):
        layers += [torch.nn.Linear(dims[i], dims[i + 1]), torch.nn.Tanh()]
    layers += [torch.nn.Linear(hidden[-1], xdim)]
    return torch.nn.Sequential(*layers)


def em_sample(net, y, num_samples, num_steps, xdim=2, T=1.0,
              beta_min=0.1, beta_max=20.0):
    """Reference-style sampler: Python loop, one net call per step."""
    ydim = y.shape[-1]
    inflated_ys = y.expand(num_samples, ydim).contiguous()
    delta = T / num_steps
    x_t = torch.randn(num_samples, xdim)
    ts = torch.linspace(0, 1, num_steps + 1) * T
    ones = torch.ones(num_samples, 1)
    with torch.no_grad():
        for i in range(num_steps):
            t = ones * ts[i]
            s = T - t
            beta_s = beta_min + (beta_max - beta_min) * s
            g = beta_s.sqrt()
            f = -0.5 * beta_s * x_t
            a = net(torch.cat([x_t, inflated_ys, s], dim=1))
            mu = g * a - f
            sigma = g
            x_t = x_t + delta * mu + delta**0.5 * sigma * torch.randn_like(x_t)
    return x_t


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=20)
    p.add_argument("--samples", type=int, default=30000)
    p.add_argument("--out", default=os.path.join(os.path.dirname(__file__),
                                                 "torch_baseline.json"))
    args = p.parse_args()

    torch.manual_seed(0)
    net = build_net()
    y = torch.tensor([[0.8, -0.3]])

    # warmup
    em_sample(net, y, 1000, 2)
    t0 = time.time()
    em_sample(net, y, args.samples, args.steps)
    elapsed = time.time() - t0
    sample_steps_per_sec = args.samples * args.steps / elapsed
    result = {
        "metric": "em_sample_steps_per_sec",
        "value": sample_steps_per_sec,
        "unit": "sample_steps/s",
        "device": "cpu" if not torch.cuda.is_available() else "cuda",
        "torch_version": torch.__version__,
        "samples": args.samples,
        "steps": args.steps,
        "elapsed_s": elapsed,
    }
    with open(args.out, "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
