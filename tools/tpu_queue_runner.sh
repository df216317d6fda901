#!/bin/bash
# Round-3 TPU work queue: blocks until the tunnel watchdog writes /tmp/tpu_up,
# then runs the queued measurements sequentially (each item bounded by timeout,
# failures don't abort the queue).  Logs land in results/tpu_queue/.
cd /root/repo || exit 1
mkdir -p results/tpu_queue
L=results/tpu_queue

echo "waiting for /tmp/tpu_up ($(date))"
while [ ! -f /tmp/tpu_up ]; do sleep 30; done
echo "=== TPU UP at $(date) ==="
cat /tmp/tpu_up

run() {
  name=$1; tmo=$2; shift 2
  echo "=== [$name] start $(date) ==="
  timeout "$tmo" "$@" > "$L/$name.log" 2>&1
  rc=$?
  echo "=== [$name] exit=$rc $(date) ==="
  tail -5 "$L/$name.log"
}

# 1. validate the fused DPS kernel on device + measure speedup
run bench_dps        1800 python bench.py --dps
# 2-3. distribution sanity: fused vs XLA guidance samplers
run sanity_dps       2400 python tools/fused_dps_sanity.py --guidance dps --clip 10
run sanity_pgdm      2400 python tools/fused_dps_sanity.py --guidance pgdm --clip 100
# 4. the missing BENCHMARKS row: PGDM full protocol (100 ys x 10 repeats)
run sweep_pgdm_full  7200 python tools/dps_guidance_sweep.py --guidance pgdm --clips 100 --full --full_repeats 10
# 5. DPS family full protocol
run sweep_dps_full  10800 python tools/dps_guidance_sweep.py --guidance dps --clips 1,3,10,30,100 --full --full_repeats 10
# 6. reference-fidelity 20k scatterometry grid (skip_existing resumes the
#    20 PINN/L1/L1 trials already trained on disk)
run grid_20k        28800 python mains/run_grid_search_scatterometry.py --config configs/config_gridsearch_scatterometry_20k.yml

echo "=== QUEUE DONE $(date) ==="
