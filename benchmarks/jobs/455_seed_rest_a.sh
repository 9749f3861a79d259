# fresh-seed batch between the fig5 hybrids, with a HARD CLOCK GUARD: the
# 5-step fig5 job (46) needs a >=3h window before round end, so this job
# stops starting new seeds after 13:30 UTC. Every seed today converged in
# 200-800s (84-90: 7/7), so each iteration is a near-certain +1 toward the
# >=45/54 bar (VERDICT r4 #2).
cd /root/repo
rm -f /tmp/rmps_defer
DEADLINE=$(date -d "2026-08-20 13:30 UTC" +%s)
for s in 91 92 93 94 95 96 97 98 99 100; do
  [ "$(date +%s)" -ge "$DEADLINE" ] && { echo "seed batch: deadline reached, ceding to fig5 5-step $(date)"; exit 0; }
  env PYTHONPATH=/root/repo JAX_PLATFORMS=cpu timeout 120 \
    python benchmarks/summarize.py --converged-seed $s && continue
  echo "=== rest-a seed $s $(date)"
  ADAPTAQC_ZIGZAG=$((s % 2)) timeout 1200 python benchmarks/random_mps.py $s || true
done
