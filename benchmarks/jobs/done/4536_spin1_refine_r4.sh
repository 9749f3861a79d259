# fig5 n=50 1-step refine round 4: the iterated warm-start refines are the
# mechanism that has been delivering +0.05 overlap per ~20-min round
# (0.8257 -> 0.8889 -> 0.9269 -> 0.9779); two more rounds plausibly cross
# the paper bar (verified >= 0.99). Gated: skips if some record's
# strictest available check already exceeds 0.99. Wall deadline so the
# round always records.
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
ADAPTAQC_WALL_DEADLINE=$(( $(date +%s) + 1500 )) \
  SPIN_REFINE_CHI=64 SPIN_REFINE_LAYERS=400 SPIN_REFINE_SUFF=8e-3 \
  timeout 2400 python benchmarks/spin_refine.py 50 1 0.2
