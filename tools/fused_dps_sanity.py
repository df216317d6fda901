"""Real-TPU sanity check for the fused guided kernels (ops/dps_kernel.py).

Loads the trained DPS prior checkpoint and compares the fused Pallas
sampler against the XLA autodiff path on a few conditions:

  * distribution-level agreement (per-condition mean/std of 30k samples),
  * wall-clock per condition for both paths.

The trajectories cannot match sample-for-sample (different PRNG streams,
like the plain fused E-M kernel); agreement is statistical.  Deterministic
per-step parity is covered in tests/test_dps_kernel.py (interpret mode).

Usage: python tools/fused_dps_sanity.py [--guidance dps|pgdm] [--clip 10]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

from dmip_tpu import train
from dmip_tpu.models import AnalyticGuidanceDPS
from dmip_tpu.problems import scatterometry as scat
from tools import common


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--guidance", choices=["dps", "pgdm"], default="dps")
    p.add_argument("--clip", type=float, default=10.0)
    p.add_argument("--train_dir", default="trained_models/scatterometry_dps")
    p.add_argument("--n_ys", type=int, default=3)
    p.add_argument("--n_samples", type=int, default=30000)
    args = p.parse_args()

    s = common.scat_setup(n_ys=args.n_ys)
    forward_model, fparams = s.forward_model, s.fparams
    model, _ = train.get_model_from_args(
        {"model": "Posterior", "lam": 1.0, "hidden_layers": [512, 512, 512]},
        fparams,
    )
    params, _ = common.resolve_checkpoint(
        model.init(jax.random.PRNGKey(0)),
        [os.path.join(args.train_dir, "checkpoint")],
        label="DPS prior checkpoint",
    )
    key = jax.random.PRNGKey(common.RANDOM_STATE)
    y_test = s.y_test

    samples = {}
    floor_samples = []  # xla re-runs with an independent key, per condition
    for method, surr in (
        ("xla", None),
        ("pallas", scat.load_surrogate_weights()),
    ):
        ag = AnalyticGuidanceDPS(
            model, forward_model, fparams, guidance_clip=args.clip,
            guidance=args.guidance, surrogate_weights=surr,
        )
        sampler = jax.jit(
            lambda k, y: ag.sample(params, k, y, args.n_samples, 200,
                                   method=method)
        )
        out = jax.block_until_ready(sampler(key, y_test[0]))  # compile
        t0 = time.time()
        per_y = []
        for i in range(args.n_ys):
            out = sampler(jax.random.fold_in(key, i), y_test[i])
            xs = np.asarray(out)
            per_y.append(xs)
            print(f"{method} y{i}: mean={xs.mean(0).round(4)} "
                  f"std={xs.std(0).round(4)} finite={np.isfinite(xs).all()}",
                  flush=True)
        dt = (time.time() - t0) / args.n_ys
        samples[method] = per_y
        print(f"{method}: {dt:.2f} s/condition "
              f"({args.n_samples * 200 / dt / 1e6:.1f}M sample-steps/s)",
              flush=True)
        if method == "xla":
            # Same-sampler floor: the guided SDE's run-to-run variability
            # under an independent noise stream.  Clipped DPS drifts are
            # stiff and heavy-tailed (per-axis std can reach 3-5 when
            # samples escape the box), so the cross-sampler W2 must be
            # judged against this floor, not an absolute constant.
            for i in range(args.n_ys):
                out = sampler(jax.random.fold_in(key, 1000 + i), y_test[i])
                floor_samples.append(np.asarray(out))

    # Distribution-level agreement: sliced-W2 between the two samplers'
    # populations per condition (same metric the eval harness reports;
    # the GT-vs-GT floor at 30k samples is ~0.003).
    from dmip_tpu.evaluate import sliced_w2

    # A condition fails if BOTH its cross-sampler W2 exceeds the absolute
    # GT-floor-scale 0.02 AND it is >2.5x its own same-sampler floor
    # (independent-noise re-run).  Judged per condition: a tiny-W2 condition
    # with a big ratio must not mask a genuine mismatch elsewhere.
    worst_ratio, worst = 0.0, 0.0
    failures = []
    for i in range(args.n_ys):
        w2 = float(sliced_w2(jax.random.PRNGKey(99),
                             samples["xla"][i], samples["pallas"][i]))
        w2_floor = float(sliced_w2(jax.random.PRNGKey(99),
                                   samples["xla"][i], floor_samples[i]))
        ratio = w2 / max(w2_floor, 1e-9)
        print(f"y{i}: sliced-W2(xla, pallas) = {w2:.5f}  "
              f"xla-vs-xla floor = {w2_floor:.5f}  ratio = {ratio:.2f}",
              flush=True)
        worst_ratio = max(worst_ratio, ratio)
        worst = max(worst, w2)
        if w2 > 0.02 and ratio > 2.5:
            failures.append(
                f"y{i}: sliced-W2 {w2:.4f} is {ratio:.1f}x its "
                f"same-sampler floor {w2_floor:.4f} (and > 0.02)"
            )
    if failures:
        for msg in failures:
            print(f"MISMATCH: {msg}", flush=True)
        sys.exit(1)
    print(f"OK: fused and XLA samplers agree on every condition "
          f"(worst sliced-W2 {worst:.5f}, worst ratio {worst_ratio:.2f}x)",
          flush=True)


if __name__ == "__main__":
    main()
