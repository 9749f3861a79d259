# iterate the winning fig5 recipe (chi=64 global refine of best 1-step:
# 0.8953 -> 0.9269 in 21 min) up to 3 more rounds, stopping early if a
# round crosses 0.99 on its strictest available check
cd /root/repo
for i in 1 2 3; do
  python3 - <<'PY' && break
import json, sys
best = 0.0
for line in open('benchmarks/results_spin_chain.jsonl'):
    try:
        r = json.loads(line)
    except ValueError:
        continue
    if r.get('workload', '').startswith('xxz_trotter_n50_steps1'):
        ovs = [v for v in (r.get('independent_overlap'),
                           r.get('independent_engine_overlap'),
                           r.get('overlap')) if v is not None]
        if ovs:
            best = max(best, min(ovs))
sys.exit(0 if best > 0.99 else 1)
PY
  echo "=== spin refine round $i $(date)"
  SPIN_REFINE_CHI=64 SPIN_REFINE_LAYERS=400 SPIN_REFINE_SUFF=8e-3 \
    timeout 5400 python benchmarks/spin_refine.py 50 1 0.2 || true
done
exit 0
