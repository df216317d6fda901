"""GT-half-swap test: is SNF's forward-KL rank edge real or GT noise?

Round-3 verdict: the refined sampler statistically ties SNF on forward
histogram KL (paired p>=0.19) but SNF keeps a small consistent per-condition
rank edge (79-81/100 conditions, ~0.01 mean).  The floor analysis argued it
is a sparse-histogram artifact; THIS tool runs the one experiment that can
settle it: score each sampler's (fixed) sample set against each disjoint
150k-sample half of the MCMC ground truth separately and test whether the
rank edge is stable across halves — i.e. whether it exceeds GT-resampling
noise.

Design (kept deliberately paired):
  * each sampler draws ONE sample set per condition (5 repeats x 30k, the
    same keys for both halves), so the only thing that changes between the
    A-score and the B-score is the GT half (reference protocol otherwise:
    main_diffusion_scatterometry.py:94-122, 75^3 histograms).
  * GT half A = MCMC repeats 0-4, half B = repeats 5-9 (disjoint chains,
    150k samples each — the same split evaluate.gt_floor_scatterometry uses).
  * per condition also scores KL(A||B), the GT-vs-GT floor on these exact
    histograms.

Decision: if SNF's per-condition win count and the paired delta keep their
sign and magnitude in BOTH halves (and correlate across halves), the edge is
a stable property of the samplers; if the edge's per-condition signs churn
at the rate GT resampling churns the floor, it is inside GT-resampling noise.

Usage: python tools/gt_half_swap.py [--cfg mh,20,0.2] [--n_ys 100]
Writes benchmarks/paired/gt_half_swap_<tag>.csv and prints the verdict.
"""

from __future__ import annotations

import argparse
import csv
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from dmip_tpu import flows, train
from dmip_tpu.evaluate import histogramdd_flat, kl_pair
from tools import common

NBINS, XLIM = 75, (-1.2, 1.2)
HALF = 5  # repeats per GT half (reference n_repeats=10 split in two)


def snf_from_config(s):
    """The baselines driver's SNF (config_baselines_scatterometry.yml) +
    its archived checkpoint."""
    snf = flows.create_snf(
        4, 64, s.energy, metr_steps_per_block=10,
        dimension=s.fparams["xdim"], dimension_condition=s.fparams["ydim"],
        noise_std=0.4,
    )
    k_snf = jax.random.split(s.k_train, 3)[0]
    params, _ = common.resolve_checkpoint(snf.init(k_snf), [
        os.path.join("trained_models", "scatterometry", "baselines", "snf"),
        os.path.join("benchmarks", "checkpoints", "baselines_snf"),
    ], label="SNF checkpoint")
    return snf, params


def model_hist_fn(sample_fn):
    """jit: (keys[HALF], y) -> 75^3 histogram summed over HALF repeats."""

    def hist_one(k, y):
        x = sample_fn(k, y)
        return histogramdd_flat(x, NBINS, *XLIM)

    @jax.jit
    def f(keys, y):
        # lax.map, not vmap: the fused Pallas sampler has no vmap rule
        hists = jax.lax.map(lambda k: hist_one(k, y), keys)
        return jnp.sum(hists, axis=0)

    return f


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--cfg", default="mh,20,0.2",
                   help="refinement config (tools/common.build_refined "
                        "grammar) for the refined sampler column")
    p.add_argument("--cfgs", nargs="*", default=None,
                   help="ADDITIONAL refinement configs to score in the same "
                        "run (amortizes SNF/CDE/GT work; each adds a paired "
                        "column set and its own verdict block)")
    p.add_argument("--ckpt_dir", default=None,
                   help="proposal checkpoint override (default: the "
                        "500k-epoch archive via the parity tool's "
                        "resolution order)")
    p.add_argument("--gt_dir", default="data/gt_samples_scatterometry")
    p.add_argument("--n_ys", type=int, default=100)
    p.add_argument("--n_samples", type=int, default=30_000)
    p.add_argument("--out", default=None)
    args = p.parse_args()

    s = common.scat_setup()
    gt = common.gt_loader(args.gt_dir)

    # samplers ------------------------------------------------------------
    cde, _ = train.get_model_from_args(common.BEST_TRIAL_CFG, s.fparams)
    candidates = [args.ckpt_dir] if args.ckpt_dir else [
        os.path.join(common.BEST_TRIAL_DIR, "checkpoint_xlong"),
        os.path.join("benchmarks", "checkpoints", "cde_500k"),
    ]
    cde_params, _ = common.resolve_checkpoint(
        cde.init(s.k_init), candidates, label="proposal checkpoint")
    refined, tag = common.build_refined(cde, s.energy, args.cfg)
    snf, snf_params = snf_from_config(s)

    n = args.n_samples
    fns = {
        "snf": model_hist_fn(lambda k, y: snf.sample(snf_params, k, y, n)),
        "cde": model_hist_fn(lambda k, y: cde.sample(cde_params, k, y, n, 200)),
        "ref": model_hist_fn(
            lambda k, y: refined.sample(cde_params, k, y, n, 200)),
    }
    extra_tags = []
    for cfg_str in args.cfgs or ():
        m, t = common.build_refined(cde, s.energy, cfg_str)
        extra_tags.append(t)
        fns[t] = model_hist_fn(
            lambda k, y, m=m: m.sample(cde_params, k, y, n, 200))

    @jax.jit
    def gt_hist(x):
        return histogramdd_flat(x, NBINS, *XLIM)

    # per-condition scoring ------------------------------------------------
    cols = {f"kl_{m}_{h}": [] for m in fns for h in "AB"}
    cols["kl_AB"] = []
    for i in range(args.n_ys):
        keys = jnp.stack([
            jax.random.fold_in(s.k_eval, i * HALF + j) for j in range(HALF)
        ])
        h_gt = {
            "A": sum(gt_hist(jnp.asarray(np.asarray(gt(i, j), np.float32)))
                     for j in range(HALF)),
            "B": sum(gt_hist(jnp.asarray(np.asarray(gt(i, j), np.float32)))
                     for j in range(HALF, 2 * HALF)),
        }
        for m, f in fns.items():
            hm = f(keys, s.y_test[i])
            for h in "AB":
                cols[f"kl_{m}_{h}"].append(float(kl_pair(h_gt[h], hm)[0]))
        cols["kl_AB"].append(float(kl_pair(h_gt["A"], h_gt["B"])[0]))
        if (i + 1) % 10 == 0:
            print(f"[half-swap] {i + 1}/{args.n_ys} conditions", flush=True)

    out = args.out or os.path.join("benchmarks", "paired",
                                   f"gt_half_swap_{tag}.csv")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    with open(out, "w", newline="") as f:
        w = csv.writer(f)
        names = list(cols)
        w.writerow([""] + names)
        for i in range(args.n_ys):
            w.writerow([i] + [cols[k][i] for k in names])
    print(f"per-condition table: {out}", flush=True)
    arr = {k: np.asarray(v) for k, v in cols.items()}
    report(arr, tag)
    for t in extra_tags:
        sub = dict(arr)
        sub["kl_ref_A"], sub["kl_ref_B"] = arr[f"kl_{t}_A"], arr[f"kl_{t}_B"]
        report(sub, t)


def report(c, tag):
    from scipy import stats

    n = len(c["kl_AB"])
    print(f"\n=== GT-half-swap verdict (refined={tag}, {n} conditions, "
          f"150k GT per half, 150k model samples fixed across halves) ===")
    for m in ("snf", "cde", "ref"):
        a, b = c[f"kl_{m}_A"], c[f"kl_{m}_B"]
        d = a - b
        print(f"{m:>4}: KL vs half A {a.mean():.4f}  vs half B {b.mean():.4f}"
              f"  |A-B| per-condition {np.abs(d).mean():.4f} "
              f"(GT-resampling noise on this sampler)")
    print(f"floor KL(A||B): {c['kl_AB'].mean():.4f} "
          f"+- {c['kl_AB'].std(ddof=1):.4f}")

    deltas = {}
    for h in "AB":
        d = c[f"kl_ref_{h}"] - c[f"kl_snf_{h}"]
        deltas[h] = d
        edge = int(np.sum(d > 0))
        t, pt = stats.ttest_rel(c[f"kl_ref_{h}"], c[f"kl_snf_{h}"])
        try:
            _, pw = stats.wilcoxon(d)
        except ValueError:
            pw = float("nan")
        print(f"half {h}: SNF wins {edge}/{n} conditions | paired d(ref-snf) "
              f"{d.mean():+.4f} +- {d.std(ddof=1)/np.sqrt(n):.4f} "
              f"(t p={pt:.2g}, wilcoxon p={pw:.2g})")

    flips = int(np.sum(np.sign(deltas["A"]) != np.sign(deltas["B"])))
    corr = float(np.corrcoef(deltas["A"], deltas["B"])[0, 1])
    # the same statistic under pure GT resampling: SNF-vs-SNF half
    # disagreement scale (how much a sampler's per-condition KL moves when
    # only the GT half changes)
    noise = np.abs(c["kl_snf_A"] - c["kl_snf_B"])
    print(f"cross-half: sign flips {flips}/{n}, corr(d_A, d_B)={corr:.2f}")
    print(f"per-condition |d| vs GT-resampling noise: |d_A| mean "
          f"{np.abs(deltas['A']).mean():.4f} vs |KL_snf_A - KL_snf_B| mean "
          f"{noise.mean():.4f}")
    both = np.sign(deltas["A"].mean()) == np.sign(deltas["B"].mean())
    stable = both and flips < n // 4 and corr > 0.5
    print("VERDICT: " + (
        "the rank edge is STABLE across GT halves (a real sampler property, "
        "not GT-resampling noise)" if stable else
        "the rank edge does NOT survive the GT-half swap at per-condition "
        "resolution — it is inside GT-resampling noise"), flush=True)


if __name__ == "__main__":
    main()
