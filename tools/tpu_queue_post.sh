#!/bin/bash
# Post-grid TPU work queue (round 3, continuation session): runs once the
# reference-fidelity 20k scatterometry grid finishes.  Same run() discipline
# as tools/tpu_queue_runner.sh: each item is bounded by timeout, failures
# don't abort the queue, .done markers make re-runs idempotent.
#
# Start via the watcher pattern (waits for the grid process to exit first):
#   nohup bash -c 'while kill -0 $(cat /tmp/grid20k.pid) 2>/dev/null; \
#     do sleep 60; done; bash tools/tpu_queue_post.sh' &
cd /root/repo || exit 1
mkdir -p results/tpu_queue
L=results/tpu_queue

run() {
  name=$1; tmo=$2; shift 2
  if [ -f "$L/$name.done" ]; then
    echo "=== [$name] already done, skipping ==="
    return
  fi
  echo "=== [$name] start $(date) ==="
  timeout "$tmo" "$@" > "$L/$name.log" 2>&1
  rc=$?
  echo "=== [$name] exit=$rc $(date) ==="
  [ "$rc" -eq 0 ] && touch "$L/$name.done"
  tail -5 "$L/$name.log"
}

# 1. summarize the completed 20k grid into the committed CSV
run summarize_20k    1200 python tools/summarize_grid.py \
      --src_dir grid_search_results/scatterometry_20k \
      --protocol full-20k-5rep \
      --out benchmarks/grid_summary_scatterometry_20k.csv
# 2. re-run the fused-DPS sanity check (the committed log predates the
#    same-sampler-floor judgment added in f13a668)
run sanity_dps2      2400 python tools/fused_dps_sanity.py --guidance dps --clip 10
# 3. rebuild the 500k-epoch converged CDE (wiped by the round restart) so
#    it can be archived into benchmarks/checkpoints/
run train_cde500k    7200 python tools/refined_snf_parity.py --train
# 4. archive it
run archive_cde500k   300 python tools/archive_checkpoint.py \
      "grid_search_results/scatterometry_full/cScoreFPE/PINNLoss/L2/L1/lam:0.01/lam2:0.01/checkpoint_xlong" \
      cde_500k --note "converged CDE: best grid trial retrained 500k epochs + cosine lr (tools/refined_snf_parity.py --train); KL 0.624 / NLPD 1.17; proposal net of the energy-refined flagship"
# 5. rebuild the baselines (SNF/DSM-diffusion/INN checkpoints + fresh
#    full-protocol per-condition CSV — wiped with results/; needed for
#    paired refined-vs-SNF stats)
run baselines        10800 python mains/main_baselines_scatterometry.py
# 6-7. leaner refinement budgets at the FULL protocol: the round-3 sweep
#    showed hist-KL is minimized by SHORT chains (full-KL rises monotonically
#    with refine steps: 0.586@mh5 -> 0.595@mh40 while NLPD/W2 improve);
#    mh3/std0.1 and mh5/std0.05 probe whether an even shorter budget lands
#    KL <= 0.58 while keeping NLPD <= 0.65 (VERDICT round-3 target)
run refined_mh3       3600 python tools/refined_snf_parity.py --full mh,3,0.1 --paired
run refined_mh5s05    3600 python tools/refined_snf_parity.py --full mh,5,0.05 --paired
# 8. bench health check on the freed chip
run bench_r3          1800 python bench.py

echo "=== POST QUEUE DONE $(date) ==="
