#!/bin/bash
# Wait for the TPU tunnel, then run prioritized workloads unattended.
# Reprioritized 2026-08-19 after the on-device eigh A/B (pallas default,
# 1.86x sweeps) and the coarse-ladder failure (full-Trotter-step blocks
# cold-start part 1 at overlap ~1e-6; it capped near 5e-3):
#   0. bench.py under the new pallas default (fresh history entry)
#   1. chi=64 direct 1-step fig5 compile (judge "done" criterion)
#   2. fine-grained ladder of the t=1.0 fig5 target (one brick sublayer
#      per block, chi=64, tight per-part sufficient cost)
#   3. warm-start refinements of the outstanding paper seeds (quick wins)
#   4. fresh paper seeds 71-100
#   5. the 100-qubit long-budget attempt
#   6. fine ladder of the t=0.5 2-step target + spin_refine of the best
#      capped 1-step run if phase 1 fell short
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
log=/tmp/tpu_batch.log
wait_tunnel() {
  while true; do
    timeout 120 python -c "import jax; assert jax.devices()" >/dev/null 2>&1 && return
    echo "tunnel down, waiting $(date)" >> $log
    sleep 120
  done
}
# pause at job boundaries while an interactive measurement holds the lock
wait_lock() {
  while [ -e /tmp/adaptaqc_bench.lock ]; do sleep 15; done
}
echo "batch waiting for tunnel $(date)" >> $log
wait_tunnel
echo "tunnel alive $(date)" >> $log
# Phase 0: bench record under the pallas eigh default
wait_lock
echo "=== bench.py (pallas default) $(date)" >> $log
timeout 2700 python bench.py >> $log 2>&1
# Phase 1: chi=64 direct 1-step compile (t=0.2). The chi=32 surrogate was
# the measured plateau cause; pallas makes chi=64 sweeps 45.6 ms.
echo "=== spin direct n50 steps1 chi64 $(date)" >> $log
wait_tunnel; wait_lock
SPIN_CHI=64 SPIN_LAYERS=600 timeout 7200 python benchmarks/spin_chain.py 50 1 0.2 >> $log 2>&1
# Phase 2: fine ladder of the paper's t=1.0 target (5 steps x dt 0.2):
# one brick sublayer per block (depth 9), each part warm-starts from the
# carried solution at O(0.1) overlap instead of 1e-6. Tight per-part
# sufficient cost so 11 parts still land ~0.99 overall.
echo "=== spin fine-ladder n50 steps5 (t=1.0) $(date)" >> $log
wait_tunnel; wait_lock
SPIN_PARTS=1 SPIN_BLOCK_DEPTH=9 SPIN_CHI=64 SPIN_LAYERS=200 SPIN_SUFF=1e-3 \
  timeout 10800 python benchmarks/spin_chain.py 50 5 0.2 >> $log 2>&1
# Phase 3: warm-start refinement of every outstanding seed's best saved
# circuit at chi=64 (starts from cost ~0.02; CPU-validated in refine.py)
for s in 41 63 65 57 69 59 67 68; do
  # skip seeds the CPU-outage runner already pushed over the line
  # (CPU env + timeout: the axon sitecustomize can hang during an outage)
  env PYTHONPATH=/root/repo JAX_PLATFORMS=cpu timeout 120 \
    python benchmarks/summarize.py --converged-seed $s && {
    echo "seed $s already converged; skipping $(date)" >> $log; continue; }
  echo "=== refine seed $s $(date)" >> $log
  wait_tunnel; wait_lock
  timeout 4500 python benchmarks/refine.py $s >> $log 2>&1
done
# Phase 4: fresh paper seeds (zigzag A/B by parity)
for s in 71 72 73 74 75 76 77 78 79 80 81 82 83 84 85 86 87 88 89 90 \
         91 92 93 94 95 96 97 98 99 100; do
  # skip seeds the CPU-outage runner (cpu_seed_queue.sh) already converged
  env PYTHONPATH=/root/repo JAX_PLATFORMS=cpu timeout 120 \
    python benchmarks/summarize.py --converged-seed $s && {
    echo "seed $s already converged; skipping $(date)" >> $log; continue; }
  echo "=== fresh seed $s (zigzag=$((s % 2))) $(date)" >> $log
  wait_tunnel; wait_lock
  ADAPTAQC_ZIGZAG=$((s % 2)) timeout 2700 python benchmarks/random_mps.py $s >> $log 2>&1
done
# Phase 5: 100-qubit scale attempt (long budget; previous 800-layer run
# reached overlap 0.32 -- the layer budget, not the engine, was the cap)
echo "=== 100q seed 1 $(date)" >> $log
wait_tunnel; wait_lock
RMPS_N=100 RMPS_LAYERS=1600 timeout 10800 python benchmarks/random_mps.py 1 >> $log 2>&1
# Phase 6: second-tier fig5 jobs
echo "=== spin fine-ladder n50 steps2 (t=0.5) $(date)" >> $log
wait_tunnel; wait_lock
SPIN_PARTS=1 SPIN_BLOCK_DEPTH=9 SPIN_CHI=64 SPIN_LAYERS=200 SPIN_SUFF=1e-3 \
  timeout 7200 python benchmarks/spin_chain.py 50 2 0.25 >> $log 2>&1
echo "=== spin_refine n50 steps1 dt0.2 $(date)" >> $log
wait_tunnel; wait_lock
SPIN_REFINE_CHI=64 timeout 5400 python benchmarks/spin_refine.py 50 1 0.2 >> $log 2>&1
echo "batch done $(date)" >> $log
