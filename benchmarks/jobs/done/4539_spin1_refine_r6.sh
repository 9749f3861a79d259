# fig5 n=50 1-step refine round 6: rounds 4/5 reached true overlap 0.9861
# (re-verified; their own records were buried by the true-cost collapse
# fixed in cplx.verification_eigh). With the verified stop now reading
# correctly, one more round from 0.9861 (cost 0.014 -> suff 8e-3) should
# cross the paper bar. Gate: skip if >0.99 already recorded.
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
[ "$(date +%s)" -ge "$(date -d "2026-08-21 02:35 UTC" +%s)" ] && { echo "refine r6: ceding to the ladder"; exit 0; }
ADAPTAQC_WALL_DEADLINE=$(( $(date +%s) + 1500 )) \
  SPIN_REFINE_CHI=64 SPIN_REFINE_LAYERS=400 SPIN_REFINE_SUFF=8e-3 \
  timeout 2400 python benchmarks/spin_refine.py 50 1 0.2
