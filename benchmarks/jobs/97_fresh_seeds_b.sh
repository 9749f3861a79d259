# Fresh paper seeds 95-100 (untried), deadline-guarded records as usual.
cd /root/repo
for s in 95 96 97 98 99 100; do
  env PYTHONPATH=/root/repo JAX_PLATFORMS=cpu timeout 120 \
    python benchmarks/summarize.py --converged-seed $s && continue
  echo "=== fresh-b seed $s $(date)"
  ADAPTAQC_WALL_DEADLINE=$(( $(date +%s) + 1100 )) \
    ADAPTAQC_ZIGZAG=$((s % 2)) timeout 1500 \
    python benchmarks/random_mps.py $s || true
done
