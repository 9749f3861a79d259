#!/bin/bash
# n=50 fig5 plateau A/B: from the SAME 0.8593 warm start (the best direct
# 1-step compile), does local-cost Rotosolve (ISL's large-n recommendation,
# reference optimise_local_cost) descend past the global-cost plateau?
#
#   arm L: local cost refinement, 250 extra layers, chi=64
#   arm G: global cost refinement (control), 250 extra layers, chi=64
#
# The late-stage global-cost descent rate is ~1e-4/layer and decelerating
# (ladder part 2, /tmp/ladder_n50.log) — budget alone cannot close
# 0.174 -> 0.008. Both arms record independently-verified global overlap.
#
# Serialization: hold /tmp/adaptaqc_bench.lock (seed_queue pauses at its
# next job boundary) and wait for in-flight TPU jobs first — two concurrent
# TPU clients crashed the worker twice on 2026-08-19.
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
log=/tmp/spin_ab.log
echo $$ > /tmp/spin_ab.pid
tpu_busy() {
  local d
  for d in /proc/[0-9]*; do
    tr '\0' ' ' < "$d/cmdline" 2>/dev/null \
      | grep -qE "benchmarks/(spin_chain|refine|random_mps|spin_refine)[.]py" \
      && return 0
  done
  return 1
}
echo "=== spin A/B waiting for in-flight TPU jobs $(date)" >> $log
while tpu_busy; do sleep 30; done
touch /tmp/adaptaqc_bench.lock
trap 'rm -f /tmp/adaptaqc_bench.lock /tmp/spin_ab.pid' EXIT

wait_tunnel() {
  while true; do
    timeout 120 python -c "import jax; assert jax.devices()" >/dev/null 2>&1 && return
    echo "tunnel down, waiting $(date)" >> $log
    sleep 120
  done
}

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

echo "=== spin A/B done $(date)" >> $log
