#!/bin/bash
# Round-3 TPU work queue (rebuild-aware): the round restart wiped all
# gitignored artifacts (data/, trained_models/, grid_search_results/,
# results/), so the queue first rebuilds the checkpoints its eval-only
# items consume, then runs the queued measurements sequentially (each item
# bounded by timeout, failures don't abort the queue).  Logs land in
# results/tpu_queue/.
#
# Prerequisite: data/gt_samples_scatterometry must exist (run
# mains/generate_scatterometry_ground_truth.py first — ~10-60 min on one
# chip depending on the tunnel-latency regime).
cd /root/repo || exit 1
mkdir -p results/tpu_queue
L=results/tpu_queue
. tools/tpu_queue_lib.sh

# 0. rebuild the DPS prior checkpoint the guidance sweeps consume
run train_dps        3600 python tools/train_only.py --config configs/config_scatterometry_dps.yml
# 1. validate the fused DPS kernel on device + measure speedup
run bench_dps        1800 python bench.py --dps
# 2-3. distribution sanity: fused vs XLA guidance samplers
run sanity_dps       2400 python tools/fused_dps_sanity.py --guidance dps --clip 10
run sanity_pgdm      2400 python tools/fused_dps_sanity.py --guidance pgdm --clip 100
# 4. the missing BENCHMARKS row: PGDM full protocol (100 ys x 10 repeats)
run sweep_pgdm_full  7200 python tools/dps_guidance_sweep.py --guidance pgdm --clips 100 --full --full_repeats 10
# 5. DPS family full protocol
run sweep_dps_full  10800 python tools/dps_guidance_sweep.py --guidance dps --clips 1,3,10,30,100 --full --full_repeats 10
# 6. reference-fidelity 20k scatterometry grid (trial-level skip_existing
#    crash-resume: safe to re-run after any interruption)
run grid_20k        86400 python mains/run_grid_search_scatterometry.py --config configs/config_gridsearch_scatterometry_20k.yml

echo "=== QUEUE DONE $(date) ==="
