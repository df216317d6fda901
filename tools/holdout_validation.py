"""Held-out validation of the annealed refined flagship (round-4 verdict #2).

The round-4 flagship (CDE proposal + annealed-lambda MH refinement,
anneal=0.5) beat SNF on all four reference metrics — but its lambda-knob was
selected with the half-swap sweep on the SAME 100 conditions and the SAME
MCMC ground truth the final paired eval scores on.  This tool removes the
garden-of-forking-paths caveat with a clean split:

  select    re-select the schedule knob on the TUNING split (conditions
            0..49) only, at full per-condition fidelity (10 repeats x 30k),
            against the default GT.
  snf_fresh re-evaluate the archived SNF baseline against a FRESH-SEED GT
            (same conditions, independent MCMC chains —
            mains/generate_scatterometry_ground_truth.py --mcmc_seed) so the
            held-out pairing never touches the GT realization any knob saw.
  score     run the selected config on the DISJOINT held-out split
            (conditions 50..99) against the fresh-seed GT, paired
            per-condition vs the fresh-GT SNF rows.

Reference metric sites: main_diffusion_scatterometry.py:94-122 (forward KL
on 75^3 histograms, NLPD via the MCMC energy, sliced-W2);
main_baselines_scatterometry.py for the SNF pairing columns.

Usage:
  python mains/generate_scatterometry_ground_truth.py \
      --gt_dir data/gt_samples_scatterometry_fresh --mcmc_seed 777
  python tools/holdout_validation.py --phase select
  python tools/holdout_validation.py --phase snf_fresh
  python tools/holdout_validation.py --phase score --cfg mh,20,0.2,anneal=0.5

Every phase archives its per-condition CSV under benchmarks/paired/ (the
durable convention), so the stats are recomputable from the repo.
"""

from __future__ import annotations

import argparse
import csv
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from dmip_tpu import checkpoints, evaluate, flows, train
from dmip_tpu.evaluate import histogramdd_flat, kl_pair, sliced_w2
from dmip_tpu.problems import scatterometry as scat
from tools import common

SPLIT = 50  # conditions 0..49 tune, 50..99 held out
ARCHIVE = os.path.join("benchmarks", "paired")


def _offset_loader(gt_dir: str, offset: int):
    base = common.gt_loader(gt_dir)
    return lambda i, j: base(i + offset, j)


def _setup():
    s = common.scat_setup()
    model, _ = train.get_model_from_args(common.BEST_TRIAL_CFG, s.fparams)
    params, _ = common.resolve_checkpoint(
        model.init(s.k_init),
        [os.path.join(common.BEST_TRIAL_DIR, "checkpoint_xlong"),
         os.path.join("benchmarks", "checkpoints", "cde_500k")],
        label="proposal checkpoint",
    )
    return s, model, params


def _archive(src_csv: str, name: str):
    os.makedirs(ARCHIVE, exist_ok=True)
    dst = os.path.join(ARCHIVE, name)
    shutil.copyfile(src_csv, dst)
    print(f"archived -> {dst}", flush=True)


def _refined_eval(s, model, params, cfg_str, ys, gt, out_dir, repeats):
    m, tag = common.build_refined(model, s.energy, cfg_str)
    kl, nlpd, mse = evaluate.evaluate_scatterometry(
        m, params, s.forward_model, s.fparams, s.score_post,
        ys, gt, s.k_eval, out_dir=out_dir, n_samples_x=30000,
        n_repeats=repeats, verbose=False, progress_every=200,
    )
    return tag, kl, nlpd, mse


def phase_select(args):
    """Knob selection restricted to the tuning split + default GT."""
    s, model, params = _setup()
    ys = s.y_test[:SPLIT]
    gt = common.gt_loader(args.gt_dir)
    rows = []
    for cfg_str in args.cfgs.split():
        out_dir = os.path.join("results", "holdout",
                              "select_" + cfg_str.replace(",", "_")
                              .replace("=", ""))
        tag, kl, nlpd, mse = _refined_eval(
            s, model, params, cfg_str, ys, gt, out_dir, args.repeats)
        with open(os.path.join(out_dir, "results.csv")) as f:
            cols = list(csv.DictReader(f))
        kl_rev = float(np.mean([float(r["KL_reverse"]) for r in cols]))
        w2 = float(np.mean([float(r["W2"]) for r in cols]))
        rows.append(dict(cfg=cfg_str, tag=tag, kl=kl, kl_rev=kl_rev,
                         nlpd=nlpd, w2=w2))
        print(f"SELECT[{cfg_str}] KL={kl:.4f} rev={kl_rev:.4f} "
              f"NLPD={nlpd:.4f} W2={w2:.4f}", flush=True)
        os.makedirs(ARCHIVE, exist_ok=True)
        with open(os.path.join(ARCHIVE, "holdout_select_summary.csv"),
                  "w", newline="") as f:
            w = csv.DictWriter(f, fieldnames=list(rows[0].keys()))
            w.writeheader()
            w.writerows(rows)
    best = min(rows, key=lambda r: r["kl"])
    print(f"WINNER on tune split (mean fwd-KL): {best['cfg']}", flush=True)


def phase_snf_fresh(args):
    """Archived SNF baseline re-scored against the fresh-seed GT, all 100
    conditions (rows 50..99 feed the held-out pairing)."""
    s, _, _ = _setup()
    # architecture must match the archived checkpoint
    # (configs/config_baselines_scatterometry.yml)
    cfg = {"num_layers_INN": 4, "size_hidden_layers_INN": 64,
           "metr_steps_per_block": 10, "noise_std": 0.4}
    neg_log_post = lambda x, ys: scat.get_log_posterior(
        x, s.forward_model, s.fparams["a"], s.fparams["b"], ys,
        s.fparams["lambd_bd"])
    snf = flows.create_snf(
        int(cfg["num_layers_INN"]), int(cfg["size_hidden_layers_INN"]),
        neg_log_post, metr_steps_per_block=int(cfg["metr_steps_per_block"]),
        dimension=s.fparams["xdim"], dimension_condition=s.fparams["ydim"],
        noise_std=float(cfg["noise_std"]),
    )
    k_snf = jax.random.split(s.k_train, 3)[0]
    snf_params, _ = common.resolve_checkpoint(
        snf.init(k_snf),
        [os.path.join("trained_models", "scatterometry", "baselines", "snf"),
         os.path.join("benchmarks", "checkpoints", "baselines_snf")],
        label="SNF checkpoint",
    )
    gt = common.gt_loader(args.gt_dir_fresh)
    n_x, n_repeats = 30000, args.repeats
    nbins, xlim = 75, (-1.2, 1.2)
    ydim = s.fparams["ydim"]

    @jax.jit
    def eval_y_repeat(key, y, x_true):
        k3, kw = jax.random.split(key)
        ys_t = jnp.broadcast_to(y, (n_x, ydim))
        energy = lambda x: neg_log_post(x, ys_t)
        x_snf = snf.sample(snf_params, k3, y, n_x)
        hists = [histogramdd_flat(v, nbins, *xlim) for v in (x_true, x_snf)]
        nlls = [jnp.sum(energy(v)) / n_x for v in (x_true, x_snf)]
        w2 = sliced_w2(kw, x_snf, x_true)
        return hists, nlls, w2

    k_eval = s.k_eval
    rows = []
    for i in range(s.y_test.shape[0]):
        h_sum = [jnp.zeros(nbins ** 3, jnp.float32) for _ in range(2)]
        nll_sum, w2_sum = [0.0, 0.0], 0.0
        for j in range(n_repeats):
            k_eval, k = jax.random.split(k_eval)
            x_true = jnp.asarray(gt(i, j), jnp.float32)
            hists, nlls, w2 = eval_y_repeat(k, s.y_test[i], x_true)
            h_sum = [a + b for a, b in zip(h_sum, hists)]
            nll_sum = [a + float(v) / n_repeats
                       for a, v in zip(nll_sum, nlls)]
            w2_sum += float(w2) / n_repeats
        klf, klr = kl_pair(h_sum[0], h_sum[1])
        rows.append({"KL_SNF": float(klf), "KL_SNF_reverse": float(klr),
                     "NLL_mcmc": nll_sum[0], "NLL_snf": nll_sum[1],
                     "W2_SNF": w2_sum})
        if (i + 1) % 10 == 0:
            print(f"snf-fresh {i + 1}/100 KL={float(klf):.3f}", flush=True)

    out_dir = os.path.join("results", "holdout", "snf_fresh")
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, "results.csv")
    with open(path, "w", newline="") as f:
        w = csv.DictWriter(f, [""] + list(rows[0].keys()))
        w.writeheader()
        for i, r in enumerate(rows):
            w.writerow({"": i, **r})
    _archive(path, "holdout_snf_fresh_gt.csv")
    print("SNF vs fresh GT mean KL:",
          float(np.mean([r["KL_SNF"] for r in rows])), flush=True)


def phase_score(args):
    """The selected config on the held-out split vs the fresh-seed GT,
    paired against the fresh-GT SNF rows."""
    from scipy import stats

    if args.cfg == "auto":
        summary = os.path.join(ARCHIVE, "holdout_select_summary.csv")
        with open(summary) as f:
            sel = list(csv.DictReader(f))
        args.cfg = min(sel, key=lambda r: float(r["kl"]))["cfg"]
        print(f"auto-selected tune-split winner: {args.cfg}", flush=True)

    s, model, params = _setup()
    ys = s.y_test[SPLIT:]
    gt = _offset_loader(args.gt_dir_fresh, SPLIT)
    out_dir = os.path.join("results", "holdout",
                           "score_" + args.cfg.replace(",", "_")
                           .replace("=", ""))
    tag, kl, nlpd, mse = _refined_eval(
        s, model, params, args.cfg, ys, gt, out_dir, args.repeats)
    path = os.path.join(out_dir, "results.csv")
    _archive(path, f"holdout_score_{tag}.csv")

    snf_csv = args.snf_fresh_csv
    if not os.path.exists(snf_csv):
        print(f"no fresh-GT SNF rows at {snf_csv}; run --phase snf_fresh",
              flush=True)
        return
    with open(snf_csv) as f:
        base = list(csv.DictReader(f))[SPLIT:]
    with open(path) as f:
        ours = list(csv.DictReader(f))
    assert len(base) == len(ours) == 100 - SPLIT

    def col(rows, name):
        return np.array([float(r[name]) for r in rows])

    snf_kl = col(base, "KL_SNF")
    snf_rev = col(base, "KL_SNF_reverse")
    snf_nlpd = np.abs(col(base, "NLL_snf") - col(base, "NLL_mcmc"))
    snf_w2 = col(base, "W2_SNF")
    our_kl = col(ours, "KL2")
    our_rev = col(ours, "KL_reverse")
    our_nlpd = np.abs(col(ours, "NLL_diffusion") - col(ours, "NLL_mcmc"))
    our_w2 = col(ours, "W2")

    print(f"HELD-OUT ({100 - SPLIT} conditions, fresh-seed GT) "
          f"refined[{tag}] vs SNF:", flush=True)
    for name, a, b in (("fwd-KL", our_kl, snf_kl),
                       ("rev-KL", our_rev, snf_rev),
                       ("NLPD", our_nlpd, snf_nlpd),
                       ("W2", our_w2, snf_w2)):
        d = a - b
        t, pt = stats.ttest_rel(a, b)
        print(f"  {name}: {a.mean():.4f} vs {b.mean():.4f} | paired "
              f"{d.mean():+.4f} +- {d.std(ddof=1) / np.sqrt(len(d)):.4f} "
              f"(t={t:.2f} p={pt:.2g})", flush=True)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--phase", required=True,
                   choices=("select", "snf_fresh", "score"))
    p.add_argument("--cfgs", default=(
        "mh,20,0.2 mh,20,0.2,anneal=0.3 mh,20,0.2,anneal=0.5 "
        "mh,20,0.2,anneal=0.7 mh,20,0.2,lend=0.8"))
    p.add_argument("--cfg", default="mh,20,0.2,anneal=0.5")
    p.add_argument("--repeats", type=int, default=10)
    p.add_argument("--gt_dir", default="data/gt_samples_scatterometry")
    p.add_argument("--gt_dir_fresh",
                   default="data/gt_samples_scatterometry_fresh")
    p.add_argument("--snf_fresh_csv",
                   default=os.path.join(ARCHIVE, "holdout_snf_fresh_gt.csv"))
    args = p.parse_args()
    {"select": phase_select, "snf_fresh": phase_snf_fresh,
     "score": phase_score}[args.phase](args)


if __name__ == "__main__":
    main()
