#!/bin/bash
# CPU-outage runner: work the paper-seed backlog on the host CPU while the
# TPU tunnel is down (same program, same math — just slower; records carry
# platform=cpu). Before every job it (a) skips seeds that already have a
# strict >0.99 record (summarize.py criterion, shared with seed_queue.sh)
# and (b) cedes the moment the tunnel is back so it never competes with
# seed_queue.sh for the single host core.
#
# Usage: nohup bash benchmarks/cpu_seed_queue.sh [seed ...] &
#   default plan: warm-start refinements of the outstanding seeds, then
#   fresh seeds 71-100.
cd /root/repo
log=/tmp/cpu_batch.log
tunnel_up() {
  env PYTHONPATH=/root/repo:/root/.axon_site timeout 120 \
    python -c "import jax; assert jax.devices()" >/dev/null 2>&1
}
cede_if_tunnel() {
  if tunnel_up; then
    echo "tunnel back; ceding to seed_queue $(date)" >> $log
    exit 0
  fi
}
run_seed() {  # run_seed {refine|fresh} seed
  env PYTHONPATH=/root/repo JAX_PLATFORMS=cpu timeout 120 \
    python benchmarks/summarize.py --converged-seed "$2" && {
    echo "seed $2 already converged; skipping $(date)" >> $log; return; }
  cede_if_tunnel
  # pause (don't contend) while bench.py holds the measurement lock
  while [ -e /tmp/adaptaqc_bench.lock ]; do sleep 30; done
  echo "=== cpu $1 seed $2 $(date)" >> $log
  # nice: a seed compile can outlast the outage; the TPU queue's host-side
  # work must win the single core the moment the tunnel returns
  if [ "$1" = refine ]; then
    nice -n 19 env PYTHONPATH=/root/repo JAX_PLATFORMS=cpu \
      timeout 10800 python benchmarks/refine.py "$2" >> $log 2>&1
  else
    nice -n 19 env PYTHONPATH=/root/repo JAX_PLATFORMS=cpu \
      ADAPTAQC_ZIGZAG=$(($2 % 2)) \
      timeout 10800 python benchmarks/random_mps.py "$2" >> $log 2>&1
  fi
}
echo "cpu batch start $(date)" >> $log
if [ $# -gt 0 ]; then
  for s in "$@"; do run_seed fresh "$s"; done
else
  for s in 41 63 65 57 69 59 67 68; do run_seed refine "$s"; done
  for s in $(seq 71 100); do run_seed fresh "$s"; done
fi
echo "cpu batch done $(date)" >> $log
