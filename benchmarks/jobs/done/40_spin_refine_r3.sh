# fig5 n=50 1-step: one more bounded refine round unless some record's
# strictest available overlap check already exceeds 0.99.
cd /root/repo
python3 - <<'PY' && exit 0
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
SPIN_REFINE_CHI=64 SPIN_REFINE_LAYERS=400 SPIN_REFINE_SUFF=8e-3 \
  timeout 4200 python benchmarks/spin_refine.py 50 1 0.2
