# paper random-MPS tally sprint: quick warm-start refines of the 9 capped
# seeds (proven ~3-6 min converters when they go), then fresh seeds 84-100
# with a 20-min cap each (compile_with_recovery checkpoints let a later
# rerun resume any seed the cap cuts off).
cd /root/repo
for s in 59 63 65 68 72 73 76 82 83; do
  env PYTHONPATH=/root/repo JAX_PLATFORMS=cpu timeout 120 \
    python benchmarks/summarize.py --converged-seed $s && continue
  echo "=== sprint refine seed $s $(date)"
  timeout 900 python benchmarks/refine.py $s || true
done
for s in 84 85 86 87 88 89 90 91 92 93 94 95 96 97 98 99 100; do
  env PYTHONPATH=/root/repo JAX_PLATFORMS=cpu timeout 120 \
    python benchmarks/summarize.py --converged-seed $s && continue
  echo "=== sprint fresh seed $s (zigzag=$((s % 2))) $(date)"
  ADAPTAQC_ZIGZAG=$((s % 2)) timeout 1200 python benchmarks/random_mps.py $s || true
done
