# fig5 n=50 1-step refine round 7, BAR-EXACT stop: sufficient_cost 1e-2 is
# the reference's own default success threshold (constants.py:31 — overlap
# > 0.99), so stop there instead of 8e-3 — rounds are +~0.008/round at
# this end and the session needs the remaining window for the 5-step
# ladder. Gate: skip once >0.99 is recorded.
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
[ "$(date +%s)" -ge "$(date -d "2026-08-21 02:40 UTC" +%s)" ] && { echo "refine r7: ceding to the ladder"; exit 0; }
ADAPTAQC_WALL_DEADLINE=$(( $(date +%s) + 1300 )) \
  SPIN_REFINE_CHI=64 SPIN_REFINE_LAYERS=400 SPIN_REFINE_SUFF=1e-2 \
  timeout 2100 python benchmarks/spin_refine.py 50 1 0.2
