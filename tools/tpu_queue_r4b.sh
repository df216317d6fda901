#!/bin/bash
# Round-4 continuation queue (session restart wiped the gitignored working
# artifacts: data/ GT, results/, trained_models/).  Items:
#   1. regenerate the scatterometry MCMC ground truth (fused MH kernel,
#      ~7 min for the full 100x10)
#   2. restore the archived baseline checkpoints into the working layout
#      and re-score them at the full protocol (recreates
#      results/scatterometry/baselines/results.csv for paired reports)
#   3. anneal-then-polish trade-off sweep (the new afrac= knob) through the
#      GT-half-swap scorer: can polish steps at the exact target keep the
#      annealed schedule's forward-KL win while restoring the fixed-target
#      chain's NLPD/W2?  Anchors mh,20,0.2 (fixed, +0.044) and
#      mh,20,0.2,anneal=0.5 (round-4 flagship, -0.020) reproduce the
#      committed sweep rows.
# Same run() discipline as the other queues (tools/tpu_queue_lib.sh):
# timeout-bounded, .done markers, failures don't abort the queue.
cd /root/repo || exit 1
export PYTHONPATH=.:/root/.axon_site
mkdir -p results/tpu_queue_r4b
L=results/tpu_queue_r4b
. tools/tpu_queue_lib.sh

run gt_gen 3600 python mains/generate_scatterometry_ground_truth.py

run restore_snf 120 python tools/archive_checkpoint.py --restore \
      baselines_snf trained_models/scatterometry/baselines/snf
run restore_dsm 120 python tools/archive_checkpoint.py --restore \
      baselines_dsm trained_models/scatterometry/baselines/diffusion
run restore_inn 120 python tools/archive_checkpoint.py --restore \
      baselines_inn trained_models/scatterometry/baselines/INN
run baselines_eval 7200 python mains/main_baselines_scatterometry.py --eval_only

run halfswap_afrac 10800 python tools/gt_half_swap.py --cfgs \
      mh,25,0.2,anneal=0.5,afrac=0.8 mh,30,0.2,anneal=0.5,afrac=0.67 \
      mh,40,0.2,anneal=0.5,afrac=0.5 mh,40,0.2,anneal=0.5 \
      mh,30,0.2,anneal=0.3,afrac=0.67 mh,20,0.2,anneal=0.5 \
      --out benchmarks/paired/gt_half_swap_afrac.csv

echo "=== QUEUE R4B DONE $(date) ==="
