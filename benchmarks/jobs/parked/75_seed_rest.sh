# resume the deferred random-MPS seed sprint (fresh seeds; each checks
# summarize --converged-seed first so completed seeds no-op, and
# compile_with_recovery resumes any checkpointed partial runs).
cd /root/repo
rm -f /tmp/rmps_defer
[ -e /tmp/teig_ok ] && export ADAPTAQC_EIGH=teig
for s in 90 91 92 93 94 95 96 97 98 99 100 86 88; do
  env PYTHONPATH=/root/repo JAX_PLATFORMS=cpu timeout 120 \
    python benchmarks/summarize.py --converged-seed $s && continue
  echo "=== rest sprint seed $s $(date)"
  ADAPTAQC_ZIGZAG=$((s % 2)) timeout 1200 python benchmarks/random_mps.py $s || true
done
# near-miss refines, chi-schedule arsenal (VERDICT r4 #2)
for s in 59 68 72 76 82 83; do
  env PYTHONPATH=/root/repo JAX_PLATFORMS=cpu timeout 120 \
    python benchmarks/summarize.py --converged-seed $s && continue
  echo "=== rest refine seed $s $(date)"
  timeout 1200 python benchmarks/refine.py $s || true
done
