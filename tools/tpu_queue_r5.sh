#!/bin/bash
# Round-5 TPU work queue (sequential; crash-resume via .done markers —
# tools/tpu_queue_lib.sh).  Items map to VERDICT r4 "Next round":
#   1. fresh-seed ground truth (same conditions, independent chains)
#   2-4. held-out validation of the annealed flagship (verdict #2):
#        select on conditions 0..49 (default GT), re-score SNF vs the
#        fresh GT, score the winner on conditions 50..99 (fresh GT)
#   5. exponential-integrator full protocol on the LINEAR problem
#      (scatterometry ran standalone; verdict #1)
#   6. expint-32 proposal composed with the annealed MH-20 flagship
#      (verdict #7)
#   7-9. linear headline rows regenerated so their per-condition CSVs
#        can be archived under benchmarks/paired/ (verdict #5)
cd /root/repo || exit 1
export PYTHONPATH=.:/root/.axon_site
mkdir -p results/tpu_queue_r5
L=results/tpu_queue_r5
. tools/tpu_queue_lib.sh

run gt_fresh 3600 python mains/generate_scatterometry_ground_truth.py \
  --gt_dir data/gt_samples_scatterometry_fresh --mcmc_seed 777

run holdout_select 7200 python tools/holdout_validation.py --phase select
run holdout_snf_fresh 3600 python tools/holdout_validation.py --phase snf_fresh
run holdout_score 3600 python tools/holdout_validation.py --phase score --cfg auto

run expint_linear 7200 python tools/expint_eval.py --problem linear

run expint_composed 3600 python tools/refined_snf_parity.py \
  --full mh,20,0.2,anneal=0.5 --method expint:sde:1 --num_steps 32 --paired

run linear_refined 3600 python mains/main_diffusion_linear.py \
  --config configs/config_linear_refined.yml
run linear_pinn2 3600 python mains/main_diffusion_linear.py \
  --config configs/config_linear_pinn2.yml
run linear_pinn2_mala 3600 python mains/main_diffusion_linear.py \
  --config configs/config_linear_pinn2.yml --refine mala,60,0.05

echo "=== QUEUE DONE $(date) ==="
