#!/bin/bash
# Round-4 main runner (second half). round4_flagship's fig5 stages B/C/D
# were all killed by TPU worker crashes 21:00-21:18 UTC 2026-08-19 — a
# concurrent profiling client ran alongside the queue (even SIGSTOPping the
# queue job's tree is NOT safe; the half-open worker session plus a second
# client crashes the worker). Rule going forward: every TPU measurement
# runs INSIDE the serialized queue.
#
# Strategy change vs flagship: train the large-n fresh compiles on the
# LOCAL (per-qubit) cost. The reference names local_cost_function as the
# designed answer to the global-cost barren plateau at large n
# (docs/running_options_explained.md "local_cost_function"); every
# global-cost n=50 Trotter attempt on record capped at 0.81-0.90 while the
# same machinery converges n<=12 to >0.99 — the predicted untrainability
# signature. The one local-cost arm ever run (refine, 2026-08-19) moved
# 0.8593 -> 0.8889. Recorded overlaps stay global in all harnesses.
#
# Order: T teig profile, B1 local-cost n50 s1 compile, B2 global chi=64
# refine, B3 conditional chi=128 refine, F leftover capped seeds (cheap,
# proven ~3-6 min each), C1 steps=2 ladder, C2 steps=5 ladder, E 100q
# local. Then seed_queue.sh resumes (fresh seeds 85-100).
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
log=/tmp/spin_ab.log
# pid file name matches bench.py's /tmp/*seed_queue*.pid pause glob
echo $$ > /tmp/round4_main_seed_queue.pid
touch /tmp/adaptaqc_bench.lock
trap 'rm -f /tmp/adaptaqc_bench.lock /tmp/round4_main_seed_queue.pid' EXIT

tpu_busy() {
  local d
  for d in /proc/[0-9]*; do
    tr '\0' ' ' < "$d/cmdline" 2>/dev/null \
      | grep -qE "benchmarks/(spin_chain|refine|random_mps|spin_refine|apply_profile)[.]py" \
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

echo "=== round4_main: lock held, waiting for in-flight TPU job $(date)" >> $log
while tpu_busy; do sleep 30; done

echo "=== T: teig apply-profile measurement $(date)" >> $log
wait_tunnel
PROFILE_CHI=64 timeout 900 python benchmarks/apply_profile.py \
  >> /tmp/apply_profile_r4.log 2>&1

echo "=== B1: n50 steps1 LOCAL-cost compile chi=64 $(date)" >> $log
wait_tunnel
SPIN_LOCAL=1 SPIN_CHI=64 SPIN_LAYERS=800 SPIN_SUFF=8e-3 \
  timeout 5400 python benchmarks/spin_chain.py 50 1 0.2 >> $log 2>&1

if s1_converged; then
  echo "=== B2 skipped: 1-step already >0.99 $(date)" >> $log
else
  echo "=== B2: global chi=64 refine of best 1-step $(date)" >> $log
  wait_tunnel
  SPIN_REFINE_CHI=64 SPIN_REFINE_LAYERS=400 SPIN_REFINE_SUFF=8e-3 \
    timeout 5400 python benchmarks/spin_refine.py 50 1 0.2 >> $log 2>&1
fi

if s1_converged; then
  echo "=== B3 skipped: 1-step already >0.99 $(date)" >> $log
else
  echo "=== B3: chi=128 refine of best 1-step $(date)" >> $log
  wait_tunnel
  SPIN_REFINE_CHI=128 SPIN_REFINE_LAYERS=600 SPIN_REFINE_SUFF=8e-3 \
    timeout 9000 python benchmarks/spin_refine.py 50 1 0.2 >> $log 2>&1
fi

# F first: cheap (~3-6 min each when they convert) and each is a whole
# scored seed; the big ladder jobs follow.
for s in 63 65 68 72 76 82 73 71; do
  env PYTHONPATH=/root/repo JAX_PLATFORMS=cpu timeout 120 \
    python benchmarks/summarize.py --converged-seed $s && {
    echo "seed $s already converged; skipping $(date)" >> $log; continue; }
  echo "=== F: LOCAL-cost refine seed $s $(date)" >> $log
  wait_tunnel
  REFINE_LOCAL=1 REFINE_LAYERS=300 timeout 3600 \
    python benchmarks/refine.py $s >> $log 2>&1
done

echo "=== C1: n50 steps2 (t=0.4) LOCAL-cost fine ladder $(date)" >> $log
wait_tunnel
SPIN_PARTS=1 SPIN_BLOCK_DEPTH=12 SPIN_LOCAL=1 SPIN_CHI=64 SPIN_LAYERS=250 \
  SPIN_SUFF=1e-3 timeout 10800 python benchmarks/spin_chain.py 50 2 0.2 \
  >> $log 2>&1

echo "=== C2: n50 steps5 (t=1.0) LOCAL-cost fine ladder $(date)" >> $log
wait_tunnel
SPIN_PARTS=1 SPIN_BLOCK_DEPTH=12 SPIN_LOCAL=1 SPIN_CHI=64 SPIN_LAYERS=250 \
  SPIN_SUFF=1e-3 timeout 14400 python benchmarks/spin_chain.py 50 5 0.2 \
  >> $log 2>&1

echo "=== E: 100q LOCAL-cost long-budget attempt $(date)" >> $log
wait_tunnel
RMPS_N=100 RMPS_LOCAL=1 RMPS_LAYERS=1600 timeout 10800 \
  python benchmarks/random_mps.py 1 >> $log 2>&1

echo "=== round4_main done $(date)" >> $log
