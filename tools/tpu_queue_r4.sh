#!/bin/bash
# Round-4 TPU work queue (sequential; crash-resume via .done markers —
# tools/tpu_queue_lib.sh).  Items:
#   1. tempered/annealed refinement sweep through the GT-half-swap scorer
#      (the high-precision paired-vs-SNF discriminator; verdict #1b)
#   2. PINNLoss2 linear row: train + eval + exact-energy refined rescue
#      (verdict #5), then the Mahalanobis tail diagnosis
#   3. linear energy-refined flagship row (verdict #6)
#   4. 10-repeat re-score of the 20k grid's top 15 trials (verdict #4)
#      + regenerate the committed grid summary with protocol_full tags
cd /root/repo || exit 1
export PYTHONPATH=.:/root/.axon_site
mkdir -p results/tpu_queue_r4
L=results/tpu_queue_r4
. tools/tpu_queue_lib.sh

run half_swap_sweep 7200 python tools/gt_half_swap.py --cfgs \
  mh,20,0.2,lend=0.97 mh,20,0.2,lend=0.95 mh,20,0.2,lend=0.9 \
  mh,20,0.2,lend=0.8 mh,20,0.2,anneal=0.5 mh,40,0.2,anneal=0.0 \
  mh,20,0.2,acc=0.35 mh,5,0.1 mh,5,0.1,lend=0.95 mh,3,0.1 \
  --out benchmarks/paired/gt_half_swap_sweep.csv

run linear_pinn2   5400 python mains/main_diffusion_linear.py --config configs/config_linear_pinn2.yml
run pinn2_diag     1800 python tools/pinn2_diagnosis.py
run linear_refined 5400 python mains/main_diffusion_linear.py --config configs/config_linear_refined.yml

run grid_rescore  21600 python tools/reeval_finalists.py --src_dir grid_search_results/scatterometry_20k --top 15
run grid_summary    900 python tools/summarize_grid.py --src_dir grid_search_results/scatterometry_20k --protocol full-20k-5rep --protocol_full "full:20k-epochs,100ysx10rep" --out benchmarks/grid_summary_scatterometry_20k.csv

echo "=== QUEUE DONE $(date) ==="
