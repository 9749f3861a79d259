#!/bin/bash
# Dynamic TPU job queue: executes benchmarks/jobs/*.sh in lexical order,
# one at a time, moving each to jobs/done/ (or jobs/failed/) afterwards.
# Replaces the fixed-stage runners (round4_main.sh etc.) — stages can be
# added/removed/reordered while the runner is live, without the
# edit-a-running-bash-script hazard. Serialization contract is unchanged:
# holds /tmp/adaptaqc_bench.lock for its whole life, writes a
# *seed_queue*.pid-matching pidfile so bench.py's pause glob sees it, and
# waits for any in-flight TPU client before starting.
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
log=/tmp/spin_ab.log
jobs_dir=/root/repo/benchmarks/jobs
mkdir -p "$jobs_dir/done" "$jobs_dir/failed"
echo $$ > /tmp/jobrunner_seed_queue.pid
touch /tmp/adaptaqc_bench.lock
trap 'rm -f /tmp/adaptaqc_bench.lock /tmp/jobrunner_seed_queue.pid' EXIT

tpu_busy() {
  local d
  for d in /proc/[0-9]*; do
    tr '\0' ' ' < "$d/cmdline" 2>/dev/null \
      | grep -qE "benchmarks/(spin_chain|refine|random_mps|spin_refine|apply_profile|sweep_probe)[.]py" \
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

echo "=== jobrunner: lock held, waiting for in-flight TPU job $(date)" >> $log
while tpu_busy; do sleep 30; done

idle_since=$(date +%s)
while true; do
  job=$(ls "$jobs_dir"/*.sh 2>/dev/null | head -1)
  if [ -z "$job" ]; then
    # empty queue: exit after 30 idle minutes so seed_queue.sh can resume
    if [ $(( $(date +%s) - idle_since )) -gt 1800 ]; then
      echo "=== jobrunner: queue empty 30 min, exiting $(date)" >> $log
      exit 0
    fi
    sleep 20
    continue
  fi
  idle_since=$(date +%s)
  name=$(basename "$job")
  echo "=== job $name $(date)" >> $log
  wait_tunnel
  if bash "$job" >> $log 2>&1; then
    mv "$job" "$jobs_dir/done/$name"
    rm -f "$jobs_dir/.retried_$name"
  elif [ -e "$jobs_dir/.retried_$name" ]; then
    echo "=== job $name FAILED twice $(date)" >> $log
    mv "$job" "$jobs_dir/failed/$name"
    rm -f "$jobs_dir/.retried_$name"
  else
    # retry once in a fresh process: TPU worker crashes kill the client
    # mid-compile, and the harnesses checkpoint+resume across processes
    # (benchmarks/_common.py compile_with_recovery)
    echo "=== job $name failed; retrying once $(date)" >> $log
    touch "$jobs_dir/.retried_$name"
  fi
done
