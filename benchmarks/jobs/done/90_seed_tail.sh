# Tail filler: spend whatever window remains after the fig5 5-step hybrid
# on the outstanding paper seeds — fresh seeds first (near-certain +1
# each), then the 6 near-miss refines. Start cutoff 03:42 UTC; per-run
# wall deadline so the last attempt still records before the driver's
# round-end bench (which kills in-flight clients).
cd /root/repo
CUTOFF=$(date -d "2026-08-21 03:42 UTC" +%s)
for s in 91 92 93 94 95 96 97 98 99 100 59 68 72 76 82 83; do
  [ "$(date +%s)" -ge "$CUTOFF" ] && { echo "seed tail: cutoff $(date)"; exit 0; }
  env PYTHONPATH=/root/repo JAX_PLATFORMS=cpu timeout 120 \
    python benchmarks/summarize.py --converged-seed $s && continue
  case $s in
    59|68|72|76|82|83) prog=refine ;;
    *) prog=random_mps ;;
  esac
  echo "=== seed tail $prog $s $(date)"
  ADAPTAQC_WALL_DEADLINE=$(( $(date +%s) + 1000 )) \
    ADAPTAQC_ZIGZAG=$((s % 2)) timeout 1300 \
    python benchmarks/$prog.py $s || true
done
