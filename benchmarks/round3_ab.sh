#!/bin/bash
# Round-3 prioritized TPU runner (replaces spin_ab.sh, which deadlocked:
# its tpu_busy() wait could never clear while seed_queue.sh kept launching
# fresh-seed jobs; this version takes the bench lock FIRST so the queue
# pauses at its next job boundary, then waits only for the in-flight job).
#
# Order (information value first, certain wins second):
#   A. fig5 n=50 plateau A/B from the SAME 0.8593 warm start:
#      arm L local-cost refinement vs arm G global-cost control, chi=64.
#   B. arm C: chi=128 working-precision refinement from the best saved
#      circuit (cost-surrogate inexactness is the measured plateau cause;
#      chi=64 halved the oscillation — chi=128 is the next doubling).
#   C. Warm-start refinements of every capped paper seed (three sit at
#      exactly 0.9900; refine.py's suff=8e-3 pushes past the strict tally).
# Then the lock is released and seed_queue.sh resumes (fresh seeds 83-100,
# 100q attempt, fig5 phase 6).
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
log=/tmp/spin_ab.log
# pid file name matches bench.py's /tmp/*seed_queue*.pid pause glob so a
# driver-run bench SIGSTOPs this runner's jobs during its measurement
echo $$ > /tmp/round3_ab_seed_queue.pid
touch /tmp/adaptaqc_bench.lock
trap 'rm -f /tmp/adaptaqc_bench.lock /tmp/round3_ab_seed_queue.pid' EXIT

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

echo "=== round3_ab: lock held, waiting for in-flight TPU job $(date)" >> $log
while tpu_busy; do sleep 30; done

SRC=circuits/spin_n50_s1_1787135592.qasm.gz   # direct 1-step, overlap 0.8593

echo "=== arm L: local-cost refine $(date)" >> $log
wait_tunnel
SPIN_REFINE_FROM=$SRC SPIN_REFINE_LOCAL=1 SPIN_REFINE_CHI=64 \
  SPIN_REFINE_LAYERS=250 SPIN_REFINE_SUFF=1e-4 \
  timeout 5400 python benchmarks/spin_refine.py 50 1 0.2 >> $log 2>&1

echo "=== arm G: global-cost refine (control) $(date)" >> $log
wait_tunnel
SPIN_REFINE_FROM=$SRC SPIN_REFINE_CHI=64 \
  SPIN_REFINE_LAYERS=250 SPIN_REFINE_SUFF=8e-3 \
  timeout 5400 python benchmarks/spin_refine.py 50 1 0.2 >> $log 2>&1

echo "=== arm C: chi=128 refine from best saved $(date)" >> $log
wait_tunnel
SPIN_REFINE_CHI=128 SPIN_REFINE_LAYERS=150 SPIN_REFINE_SUFF=8e-3 \
  timeout 7200 python benchmarks/spin_refine.py 50 1 0.2 >> $log 2>&1

# Capped-seed refinements: near-threshold seeds first (quick wins).
for s in 78 80 81 63 65 73 72 76 68 59 82 71 79; do
  env PYTHONPATH=/root/repo JAX_PLATFORMS=cpu timeout 120 \
    python benchmarks/summarize.py --converged-seed $s && {
    echo "seed $s already converged; skipping $(date)" >> $log; continue; }
  echo "=== refine seed $s $(date)" >> $log
  wait_tunnel
  timeout 4500 python benchmarks/refine.py $s >> $log 2>&1
done

echo "=== round3_ab done $(date)" >> $log
