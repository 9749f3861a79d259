#!/bin/bash
# Round-4 flagship runner (VERDICT r3 "next round" items 1-2, 5): the fig5
# n=50 records come FIRST this round — machinery is complete, capability
# records are what's missing. Replaces round3_ab (killed mid-list: its two
# remaining jobs were the two hardest capped-seed refinements, deferred to
# the tail here) and round3_followup (its jobs are re-ordered below).
#
# Order:
#   A. n=50 1-step FINE LADDER (reworked compile_in_parts, depth-12 blocks,
#      chi=64): each part warm-starts from the carried solution at O(0.1+)
#      overlap instead of the 1e-6 cold start that capped every direct run.
#      Cheapest shot at the >0.99 1-step record (~3 parts x ~10 min).
#   B. n=50 1-step chi-escalation compile (compile_with_chi_schedule
#      32->64->128): the designed answer to the chi-cap surrogate error;
#      n=6-validated, never recorded at n=50.
#   C. n=50 5-step (t=1.0) fine ladder — the paper's hardest fig5 target.
#   D. If 1-step still <0.99: chi=128 warm-start refine of the best saved
#      1-step circuit with a 1000-layer budget (VERDICT item 1 fallback).
#   E. 100-qubit long-budget attempt (VERDICT item 5; previous 800-layer run
#      reached 0.32 — the layer budget was the cap, not the engine).
#   F. Remaining capped-seed refinements (79, 71 deferred from round3_ab).
# Then the lock releases and seed_queue.sh resumes (fresh seeds 85-100).
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
log=/tmp/spin_ab.log
# pid file name matches bench.py's /tmp/*seed_queue*.pid pause glob so a
# driver-run bench SIGSTOPs this runner's jobs during its measurement
echo $$ > /tmp/round4_flagship_seed_queue.pid
touch /tmp/adaptaqc_bench.lock
trap 'rm -f /tmp/adaptaqc_bench.lock /tmp/round4_flagship_seed_queue.pid' EXIT

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
# best independently-checked n=50 1-step overlap on record (exit 0 if >0.99)
s1_converged() {
  python3 - <<'EOF'
import json, sys
best = 0.0
for line in open('benchmarks/results_spin_chain.jsonl'):
    try:
        r = json.loads(line)
    except ValueError:
        continue
    if r.get('workload', '').startswith('xxz_trotter_n50_steps1'):
        ovs = [v for v in (r.get('independent_overlap'),
                           r.get('independent_engine_overlap'),
                           r.get('overlap')) if v is not None]
        if ovs:
            best = max(best, min(ovs))
sys.exit(0 if best > 0.99 else 1)
EOF
}

echo "=== round4_flagship: lock held, waiting for in-flight TPU job $(date)" >> $log
while tpu_busy; do sleep 30; done

echo "=== A: n50 steps1 fine ladder (depth-12 blocks, chi64) $(date)" >> $log
wait_tunnel
SPIN_PARTS=1 SPIN_BLOCK_DEPTH=12 SPIN_CHI=64 SPIN_LAYERS=250 SPIN_SUFF=1e-3 \
  timeout 7200 python benchmarks/spin_chain.py 50 1 0.2 >> $log 2>&1

echo "=== B: n50 steps1 chi-schedule 32,64,128 $(date)" >> $log
wait_tunnel
SPIN_CHI_SCHEDULE=32,64,128 SPIN_LAYERS=600 SPIN_SUFF=8e-3 \
  timeout 12600 python benchmarks/spin_chain.py 50 1 0.2 >> $log 2>&1

echo "=== C: n50 steps5 (t=1.0) fine ladder $(date)" >> $log
wait_tunnel
SPIN_PARTS=1 SPIN_BLOCK_DEPTH=12 SPIN_CHI=64 SPIN_LAYERS=200 SPIN_SUFF=1e-3 \
  timeout 14400 python benchmarks/spin_chain.py 50 5 0.2 >> $log 2>&1

if s1_converged; then
  echo "=== D skipped: 1-step already >0.99 $(date)" >> $log
else
  echo "=== D: chi=128 refine of best 1-step, 1000-layer budget $(date)" >> $log
  wait_tunnel
  SPIN_REFINE_CHI=128 SPIN_REFINE_LAYERS=1000 SPIN_REFINE_SUFF=8e-3 \
    timeout 10800 python benchmarks/spin_refine.py 50 1 0.2 >> $log 2>&1
fi

echo "=== E: 100q long-budget attempt $(date)" >> $log
wait_tunnel
RMPS_N=100 RMPS_LAYERS=1600 timeout 10800 python benchmarks/random_mps.py 1 >> $log 2>&1

for s in 79 71 83 59 68 82 72 76 63 65 73; do
  env PYTHONPATH=/root/repo JAX_PLATFORMS=cpu timeout 120 \
    python benchmarks/summarize.py --converged-seed $s && {
    echo "seed $s already converged; skipping $(date)" >> $log; continue; }
  echo "=== F: refine seed $s $(date)" >> $log
  wait_tunnel
  timeout 4500 python benchmarks/refine.py $s >> $log 2>&1
done

echo "=== round4_flagship done $(date)" >> $log
