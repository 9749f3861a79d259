# leftover capped-seed refinements (global cost, proven recipe)
cd /root/repo
for s in 63 65 68 72 76 82 73 71; do
  env PYTHONPATH=/root/repo JAX_PLATFORMS=cpu timeout 120 \
    python benchmarks/summarize.py --converged-seed $s && {
    echo "seed $s already converged; skipping $(date)"; continue; }
  echo "=== refine seed $s $(date)"
  timeout 3600 python benchmarks/refine.py $s
done
exit 0
