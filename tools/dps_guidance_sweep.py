"""Guidance-strength sweep for analytic-guidance DPS (eval-only).

The 10k-epoch DPS run (configs/config_scatterometry_dps.yml) measures
KL 3.16 with the learned likelihood net and KL 6.05 with analytic guidance
at guidance_clip=100 — samples leave the [-1,1]^3 support (NLPD ~7e4), so
the cap is far above the O(1-10) prior-score scale and the reverse SDE is
still stiff.  This tool reuses the saved checkpoint:

1. sanity-check the PRIOR net alone (reverse-SDE samples of the learned
   unconditional prior must land in the box and match the smoothed-uniform
   moments);
2. rank guidance_clip values with a cheap protocol (20 ys x 2 repeats);
3. run the full reference protocol on the winner.

Usage: PYTHONPATH=.:/root/.axon_site python tools/dps_guidance_sweep.py \
          [--clips 1,3,10,30] [--train_dir trained_models/scatterometry_dps]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from dmip_tpu import evaluate, train
from dmip_tpu.models import AnalyticGuidanceDPS
from dmip_tpu.problems import scatterometry as scat
from tools import common


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--clips", default="1,3,10,30")
    p.add_argument("--guidance", choices=["dps", "pgdm"], default="dps")
    p.add_argument("--num_steps", type=int, default=200,
                   help="E-M steps (the sharp guided drift is stiff; more "
                        "steps probe integration error vs approximation "
                        "error)")
    p.add_argument("--train_dir", default="trained_models/scatterometry_dps")
    p.add_argument("--gt_dir", default="data/gt_samples_scatterometry")
    p.add_argument("--select_ys", type=int, default=20)
    p.add_argument("--select_repeats", type=int, default=2)
    p.add_argument("--full", action="store_true",
                   help="also run the full protocol on the best clip")
    p.add_argument("--chunk", type=int, default=10,
                   help="conditions vmapped/lax.map'd per dispatch "
                        "(tunnel-latency amortization)")
    p.add_argument("--method", default="auto",
                   choices=["auto", "xla", "pallas"],
                   help="sampler path ('auto' picks the fused Pallas "
                        "guidance kernel on TPU; 'xla' forces the autodiff "
                        "scan — the reference implementation the kernels "
                        "are validated against)")
    p.add_argument("--full_repeats", type=int, default=10,
                   help="repeats for the --full run (100 ys x N x 30k; the "
                        "reference protocol is 10 — lower values trade "
                        "histogram sharpness for wall clock on the slow "
                        "guided XLA sampling path and are tagged in the "
                        "output)")
    args = p.parse_args()

    s = common.scat_setup()
    forward_model, fparams = s.forward_model, s.fparams
    y_test, score_post, k_eval = s.y_test, s.score_post, s.k_eval
    surr_weights = scat.load_surrogate_weights()
    gt_loader = common.gt_loader(args.gt_dir)

    model, _ = train.get_model_from_args(
        {"model": "Posterior", "lam": 1.0, "hidden_layers": [512, 512, 512]},
        fparams,
    )
    params, _ = common.resolve_checkpoint(
        model.init(s.k_init),
        [os.path.join(args.train_dir, "checkpoint")],
        label="DPS prior checkpoint",
    )

    # 1. prior-net sanity: reverse-SDE samples of the unconditional prior.
    from dmip_tpu import nets, samplers

    base = model.sde.base
    drift = lambda z, c, s: base.g(s) * nets.prior_mlp_apply(
        params["prior"], z, s
    )
    xs = samplers.euler_maruyama(
        model.sde, drift, k_eval, None, 30000, 3, 200
    )
    xs = np.asarray(xs)
    in_box = float(np.mean(np.all(np.abs(xs) <= 1.05, axis=1)))
    print(f"prior-net samples: mean={xs.mean(0)} std={xs.std(0)} "
          f"in-box frac={in_box:.4f} (smoothed uniform: mean 0, "
          f"std 0.578, in-box ~1.0)", flush=True)

    # 2. clip sweep, cheap protocol.
    results = []
    for clip in [float(v) for v in args.clips.split(",")]:
        ag = AnalyticGuidanceDPS(
            model, forward_model, fparams, guidance_clip=clip,
            guidance=args.guidance, surrogate_weights=surr_weights,
        )
        kl, nlpd, mse = evaluate.evaluate_scatterometry(
            ag, params, forward_model, fparams, score_post,
            y_test[: args.select_ys], gt_loader, k_eval,
            n_samples_x=30000, n_repeats=args.select_repeats,
            num_steps=args.num_steps, verbose=False, progress_every=5,
            chunk=args.chunk, method=args.method,
        )
        print(f"clip={clip}: sel-KL={kl:.4f} NLPD={nlpd:.4f}", flush=True)
        results.append((kl, clip))

    # NaN KLs (diverged clips — the very regime this sweep probes) compare
    # False against everything and would otherwise sort first.
    results = [r for r in results if np.isfinite(r[0])]
    if not results:
        print("all clips diverged (non-finite sel-KL); no best clip", flush=True)
        return
    results.sort()
    best_clip = results[0][1]
    print(f"best clip: {best_clip} (sel-KL {results[0][0]:.4f})", flush=True)

    if args.full:
        ag = AnalyticGuidanceDPS(
            model, forward_model, fparams, guidance_clip=best_clip,
            guidance=args.guidance, surrogate_weights=surr_weights,
        )
        kl, nlpd, mse = evaluate.evaluate_scatterometry(
            ag, params, forward_model, fparams, score_post,
            y_test, gt_loader, k_eval, n_samples_x=30000,
            n_repeats=args.full_repeats,
            num_steps=args.num_steps, chunk=args.chunk, method=args.method,
            out_dir=f"results/scatterometry_dps_analytic_clip{best_clip}",
            verbose=False, progress_every=5,
        )
        print(f"FULL analytic-guidance DPS ({args.guidance}, "
              f"clip={best_clip}, 100ysx{args.full_repeats}rep): KL={kl:.4f} "
              f"NLPD={nlpd:.4f} MSE={mse:.4f}", flush=True)


if __name__ == "__main__":
    main()
