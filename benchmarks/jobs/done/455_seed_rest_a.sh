# Fresh-seed batch between the fig5 hybrids, re-timed for the final
# session (the previous 13:30 UTC deadline belonged to the morning
# segment). Every fresh seed this round converged in 200-800 s (84-90:
# 7/7), so each iteration is a near-certain +1 toward the >=45/54 bar
# (VERDICT r4 #2). Hard cutoff 01:10 UTC so the 5-step fig5 hybrid (job
# 46) keeps a >=2h window; per-run ADAPTAQC_WALL_DEADLINE guarantees every
# attempt writes a record instead of dying to its timeout.
cd /root/repo
rm -f /tmp/rmps_defer
CUTOFF=$(date -d "2026-08-21 01:30 UTC" +%s)
for s in 91 92 93 94 95 96 97 98 99 100; do
  [ "$(date +%s)" -ge "$CUTOFF" ] && { echo "seed batch: cutoff reached, ceding to fig5 5-step $(date)"; exit 0; }
  env PYTHONPATH=/root/repo JAX_PLATFORMS=cpu timeout 120 \
    python benchmarks/summarize.py --converged-seed $s && continue
  echo "=== rest-a seed $s $(date)"
  ADAPTAQC_WALL_DEADLINE=$(( $(date +%s) + 1000 )) \
    ADAPTAQC_ZIGZAG=$((s % 2)) timeout 1300 \
    python benchmarks/random_mps.py $s || true
done
