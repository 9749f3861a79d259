#!/bin/bash
# fig5 flagship jobs that depend on round-3 code (run AFTER round3_ab.sh):
#   1. n=50 5-step (t=1.0) fine ladder under the REWORKED compile_in_parts
#      (the 10:33 UTC attempt crashed in the old in-place loop: the cost
#      circuit accumulated target+ansatz past the tape buckets — "tape too
#      long: 13767"; the rework compiles incremental prefixes instead).
#   2. n=50 1-step direct compile under the chi-escalation schedule
#      (compile_with_chi_schedule 32->64->128): n=6 validation converged
#      2.2x shallower and 3.5x faster than fixed-chi.
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
log=/tmp/spin_ab.log
echo $$ > /tmp/round3_followup_seed_queue.pid

# wait for round3_ab to finish (it removes its pid file on exit)
while [ -e /tmp/round3_ab_seed_queue.pid ]; do sleep 60; done
touch /tmp/adaptaqc_bench.lock
trap 'rm -f /tmp/adaptaqc_bench.lock /tmp/round3_followup_seed_queue.pid' EXIT

tpu_busy() {
  local d
  for d in /proc/[0-9]*; do
    tr '\0' ' ' < "$d/cmdline" 2>/dev/null \
      | grep -qE "benchmarks/(spin_chain|refine|random_mps|spin_refine)[.]py" \
      && return 0
  done
  return 1
}
wait_tunnel() {
  while true; do
    timeout 120 python -c "import jax; assert jax.devices()" >/dev/null 2>&1 && return
    echo "tunnel down, waiting $(date)" >> $log
    sleep 120
  done
}
while tpu_busy; do sleep 30; done

echo "=== followup: n50 steps5 fine ladder (reworked parts) $(date)" >> $log
wait_tunnel
SPIN_PARTS=1 SPIN_BLOCK_DEPTH=12 SPIN_CHI=64 SPIN_LAYERS=200 SPIN_SUFF=1e-3 \
  timeout 14400 python benchmarks/spin_chain.py 50 5 0.2 >> $log 2>&1

echo "=== followup: n50 steps1 chi-schedule 32,64,128 $(date)" >> $log
wait_tunnel
SPIN_CHI_SCHEDULE=32,64,128 SPIN_LAYERS=600 SPIN_SUFF=8e-3 \
  timeout 14400 python benchmarks/spin_chain.py 50 1 0.2 >> $log 2>&1

echo "=== followup done $(date)" >> $log
