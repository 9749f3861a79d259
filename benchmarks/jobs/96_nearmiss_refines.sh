# Convert tonight's time-boxed partials (92: 0.9742, 94: 0.968) and the
# standing near-misses with bounded warm-start refine rounds — the same
# mechanism that took the fig5 1-step 0.978 -> 0.9933. Each run is
# deadline-guarded so a record always lands; converged seeds no-op via
# summarize. Safe against round end: the driver's bench kills in-flight
# clients, and each iteration re-checks the clock.
cd /root/repo
for s in 92 94 83 76 72 68 59 82 93 91; do
  env PYTHONPATH=/root/repo JAX_PLATFORMS=cpu timeout 120 \
    python benchmarks/summarize.py --converged-seed $s && continue
  echo "=== nearmiss refine $s $(date)"
  ADAPTAQC_WALL_DEADLINE=$(( $(date +%s) + 900 )) \
    REFINE_CHI=64 REFINE_LAYERS=300 \
    timeout 1500 python benchmarks/refine.py $s || true
done
