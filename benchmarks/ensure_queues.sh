#!/bin/bash
# Idempotent benchmark-queue supervisor: start anything that should be
# running and isn't. Safe to run at every session start (VERDICT r2 weak
# item 6: a tunnel outage once cost a whole round because nothing
# relaunched the queue).
#
# Order of precedence mirrors the runner chain: round3_ab -> followup ->
# seed_queue. Each runner coordinates through /tmp/adaptaqc_bench.lock and
# exact-pid files (never pattern-matched), so starting a missing one next
# to live ones is safe.
cd /root/repo

alive() {  # alive <pidfile>
  [ -e "$1" ] && kill -0 "$(cat "$1" 2>/dev/null)" 2>/dev/null
}

queue_alive() {
  for d in /proc/[0-9]*; do
    tr '\0' ' ' < "$d/cmdline" 2>/dev/null \
      | grep -q "benchmarks/seed_queue[.]sh" && return 0
  done
  return 1
}

if ! queue_alive; then
  echo "ensure_queues: starting seed_queue.sh"
  nohup bash benchmarks/seed_queue.sh >/dev/null 2>&1 &
fi

# jobrunner: restart if it died with jobs still queued
if ls benchmarks/jobs/*.sh >/dev/null 2>&1 \
    && ! alive /tmp/jobrunner_seed_queue.pid; then
  echo "ensure_queues: starting jobrunner.sh (pending jobs)"
  nohup bash benchmarks/jobrunner.sh >/dev/null 2>&1 &
fi

# stale lock with no live holder (a runner died without its EXIT trap):
# remove it so the queue can proceed. EVERY runner pidfile must be checked
# here (ADVICE r3: the round3-only list would have deleted a live lock held
# by another runner, recreating the two-TPU-client worker-crash condition).
if [ -e /tmp/adaptaqc_bench.lock ]; then
  holder_alive=0
  for f in /tmp/round3_ab_seed_queue.pid /tmp/round3_followup_seed_queue.pid \
           /tmp/round4_flagship_seed_queue.pid /tmp/round4_main_seed_queue.pid \
           /tmp/jobrunner_seed_queue.pid \
           /tmp/ladder_n50.pid /tmp/spin_ab.pid; do
    alive "$f" && holder_alive=1
  done
  # bench.py writes its own pid into the lock
  kill -0 "$(cat /tmp/adaptaqc_bench.lock 2>/dev/null)" 2>/dev/null && holder_alive=1
  if [ "$holder_alive" = 0 ]; then
    echo "ensure_queues: removing stale bench lock"
    rm -f /tmp/adaptaqc_bench.lock
  fi
fi
