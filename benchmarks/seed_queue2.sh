#!/bin/bash
# Second concurrent TPU runner. Rationale: single-queue jobs serialize on
# the axon relay whose ~33 ms/call sync leaves the chip mostly idle, so a
# second process can interleave device work (validated 2026-08-19 by
# watching the main queue's layer cadence before/after launch; kill this
# runner if the main queue's per-layer rate visibly craters).
#
# Order: warm-start refinements of the 8 outstanding near-converged paper
# seeds (highest tally value per minute), then fresh seeds 100 down to 71
# (REVERSE of seed_queue.sh phase 4, so the two runners approach the list
# from opposite ends; both skip already-converged seeds at job start).
cd /root/repo
echo $$ > /tmp/tpu_seed_queue2.pid   # matched by bench.py's /tmp/*seed_queue*.pid pause glob
export PYTHONPATH=/root/repo:/root/.axon_site
log=/tmp/tpu_batch2.log
wait_tunnel() {
  while true; do
    timeout 120 python -c "import jax; assert jax.devices()" >/dev/null 2>&1 && return
    echo "tunnel down, waiting $(date)" >> $log
    sleep 120
  done
}
wait_lock() {
  while [ -e /tmp/adaptaqc_bench.lock ]; do sleep 15; done
}
skip_converged() {
  env PYTHONPATH=/root/repo JAX_PLATFORMS=cpu timeout 120 \
    python benchmarks/summarize.py --converged-seed "$1"
}
echo "runner2 waiting for tunnel $(date)" >> $log
wait_tunnel
echo "runner2 tunnel alive $(date)" >> $log
for s in 41 63 65 57 69 59 67 68; do
  skip_converged $s && { echo "seed $s already converged; skipping $(date)" >> $log; continue; }
  echo "=== refine seed $s $(date)" >> $log
  wait_tunnel; wait_lock
  timeout 4500 python benchmarks/refine.py $s >> $log 2>&1
done
for s in $(seq 100 -1 71); do
  skip_converged $s && { echo "seed $s already converged; skipping $(date)" >> $log; continue; }
  echo "=== fresh seed $s (zigzag=$((s % 2))) $(date)" >> $log
  wait_tunnel; wait_lock
  ADAPTAQC_ZIGZAG=$((s % 2)) timeout 2700 python benchmarks/random_mps.py $s >> $log 2>&1
done
echo "runner2 done $(date)" >> $log
