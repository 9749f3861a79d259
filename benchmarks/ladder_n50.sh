#!/bin/bash
# n=50 fig5 ladder runs with the REDESIGNED compile_in_parts (true ladder
# semantics: part k compiles the cumulative depth-block prefix, warm-started
# from part k-1's solution — see approximate_compiler.compile_in_parts).
#
#   job 1: 1-step (t=0.2) ladder, 2 parts at block depth 12 (one brick
#          sublayer per block) — the VERDICT ">0.99 at 1 step" criterion.
#   job 2: 5-step (t=1.0) ladder, 10 parts — the paper's headline target.
#
# Serialization contract (two concurrent TPU clients crashed the worker
# 2026-08-19): hold /tmp/adaptaqc_bench.lock so seed_queue.sh pauses at its
# next job boundary, and wait for in-flight TPU benchmark jobs to drain
# before touching the chip. Match-only /proc scan — never kills anything.
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
log=/tmp/ladder_n50.log
echo $$ > /tmp/ladder_n50.pid
touch /tmp/adaptaqc_bench.lock
trap 'rm -f /tmp/adaptaqc_bench.lock /tmp/ladder_n50.pid' EXIT

tpu_busy() {
  local d
  for d in /proc/[0-9]*; do
    tr '\0' ' ' < "$d/cmdline" 2>/dev/null \
      | grep -qE "benchmarks/(spin_chain|refine|random_mps|spin_refine)[.]py" \
      && return 0
  done
  return 1
}
echo "=== ladder runner waiting for in-flight TPU jobs $(date)" >> $log
while tpu_busy; do sleep 60; done

wait_tunnel() {
  while true; do
    timeout 120 python -c "import jax; assert jax.devices()" >/dev/null 2>&1 && return
    echo "tunnel down, waiting $(date)" >> $log
    sleep 120
  done
}

echo "=== 1-step ladder (2 parts, chi=64) $(date)" >> $log
wait_tunnel
SPIN_PARTS=1 SPIN_BLOCK_DEPTH=12 SPIN_CHI=64 SPIN_LAYERS=300 SPIN_SUFF=4e-3 \
  timeout 7200 python benchmarks/spin_chain.py 50 1 0.2 >> $log 2>&1

echo "=== 5-step ladder (10 parts, chi=64) $(date)" >> $log
wait_tunnel
SPIN_PARTS=1 SPIN_BLOCK_DEPTH=12 SPIN_CHI=64 SPIN_LAYERS=200 SPIN_SUFF=2e-3 \
  timeout 14400 python benchmarks/spin_chain.py 50 5 0.2 >> $log 2>&1

echo "=== ladder runner done $(date)" >> $log
