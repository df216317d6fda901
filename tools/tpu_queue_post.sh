#!/bin/bash
# Post-grid TPU work queue (round 3, continuation session): runs once the
# reference-fidelity 20k scatterometry grid finishes.  Same run() discipline
# as tools/tpu_queue_runner.sh: each item is bounded by timeout, failures
# don't abort the queue, .done markers make re-runs idempotent.
#
# ORDERING: highest-value-first under a shrinking wall-clock budget — the
# grid summary + best-trial archive (the grid's product of record), then the
# cde500k rebuild (prerequisite of the refined probes AND the archive), then
# the short-budget refined probes (the round-3 KL<=0.58 question), then the
# merged-kernel sanity re-runs, then the long baselines rebuild, and only
# then the cheap paired reports that depend on it.
#
# Start via the watcher pattern (waits for the grid process to exit first):
#   nohup bash -c 'while kill -0 $(cat /tmp/grid20k.pid) 2>/dev/null; \
#     do sleep 60; done; bash tools/tpu_queue_post.sh' &
cd /root/repo || exit 1
mkdir -p results/tpu_queue
L=results/tpu_queue
. tools/tpu_queue_lib.sh

# 1. summarize the completed 20k grid into the committed CSV, then archive
#    the winning trial's params (benchmarks/checkpoints/README row)
run summarize_20k    1200 python tools/summarize_grid.py \
      --src_dir grid_search_results/scatterometry_20k \
      --protocol full-20k-5rep \
      --out benchmarks/grid_summary_scatterometry_20k.csv
run archive_20k_best  600 python tools/archive_best_trial.py \
      --src_dir grid_search_results/scatterometry_20k --name cde_20k_best \
      --note_prefix "best trial of the reference-fidelity single-stage 20k grid (full-20k-5rep protocol)"
# 2. rebuild the 500k-epoch converged CDE (wiped by the round restart;
#    ~15 min at the measured 800 epochs/s) and archive it
run train_cde500k    7200 python tools/refined_snf_parity.py --train
run archive_cde500k   300 python tools/archive_checkpoint.py \
      "grid_search_results/scatterometry_full/cScoreFPE/PINNLoss/L2/L1/lam:0.01/lam2:0.01/checkpoint_xlong" \
      cde_500k --note "converged CDE: best grid trial retrained 500k epochs + cosine lr (tools/refined_snf_parity.py --train); KL 0.624 / NLPD 1.17; proposal net of the energy-refined flagship"
# 3. leaner refinement budgets at the FULL protocol: the round-3 sweep
#    showed hist-KL is minimized by SHORT chains (full-KL rises monotonically
#    with refine steps: 0.586@mh5 -> 0.595@mh40 while NLPD/W2 improve);
#    mh3/std0.1 and mh5/std0.05 probe whether an even shorter budget lands
#    KL <= 0.58 while keeping NLPD <= 0.65 (VERDICT round-3 target).
#    Paired stats are decoupled (step 6) — they need the baselines CSV.
run refined_mh3       3600 python tools/refined_snf_parity.py --full mh,3,0.1
run refined_mh5s05    3600 python tools/refined_snf_parity.py --full mh,5,0.05
# 4. re-run the fused-kernel sanity checks on device: the committed DPS log
#    predates the same-sampler-floor judgment added in f13a668, and both
#    guidance paths now go through the merged _guided_em_kernel (round-3
#    dedup refactor) — re-validate each against the XLA sampler
run sanity_dps2      2400 python tools/fused_dps_sanity.py --guidance dps --clip 10
run sanity_pgdm2     2400 python tools/fused_dps_sanity.py --guidance pgdm --clip 100
# 5. rebuild the baselines (SNF/DSM-diffusion/INN checkpoints + fresh
#    full-protocol per-condition CSV — wiped with results/; needed for
#    paired refined-vs-SNF stats)
run baselines        10800 python mains/main_baselines_scatterometry.py
# 6. cheap report-only paired stats for the probes above (reads CSVs)
run paired_probes     600 python tools/refined_snf_parity.py \
      --paired_tags mh3_0.1 mh5_0.05
# 7. bench health check on the freed chip
run bench_r3          1800 python bench.py

echo "=== POST QUEUE DONE $(date) ==="
