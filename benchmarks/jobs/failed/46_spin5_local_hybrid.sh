# fig5 n=50 5-step (t=1.0), LADDER from the best 1-step solution. The
# pure global-cost direct compile capped at overlap 0.0025 (VERDICT r4
# missing #1) and tonight's hybrid local-cost 1-step trajectory shows cold
# 50q compiles descend ~0.0004/layer — too slow for t=1.0 in this window.
# What HAS worked is warm-started continuation (1-step refines: 0.8257 ->
# 0.9779). So: compile_in_parts with one Trotter step per block,
# start_part=1 warm-started from the best recorded 1-step solution, with
# the round-5 carried-fidelity protection (reoptimise_carried="auto")
# keeping each part from destroying the carried overlap.
# ADAPTAQC_WALL_DEADLINE stops each part's layer loop at 03:10 UTC
# (post-deadline parts fast-forward at one layer each) so the ladder
# always records its part_overlaps; 03:30 timeout is the backstop.
cd /root/repo
now=$(date +%s)
ddl=$(date -d "2026-08-21 03:10 UTC" +%s)
end=$(date -d "2026-08-21 03:45 UTC" +%s)
[ "$end" -le "$now" ] && { echo "spin5: no window left $(date)"; exit 0; }
[ "$ddl" -le "$now" ] && ddl=$(( now + 600 ))
best=$(python3 - <<'PY'
import json
best = (0.0, None)
for line in open('benchmarks/results_spin_chain.jsonl'):
    try:
        r = json.loads(line)
    except ValueError:
        continue
    if r.get('workload') == 'xxz_trotter_n50_steps1_dt0.2' and r.get('circuit'):
        ovs = [v for v in (r.get('independent_overlap'),
                           r.get('independent_engine_overlap'),
                           r.get('overlap')) if v is not None]
        ov = min(ovs) if ovs else 0.0
        if ov > best[0]:
            best = (ov, r['circuit'])
print(best[1] or '')
PY
)
[ -z "$best" ] && { echo "spin5 ladder: no 1-step circuit to start from"; exit 1; }
echo "spin5 ladder: warm start from $best, deadline $(date -d @$ddl)"
ADAPTAQC_WALL_DEADLINE=$ddl SPIN_PARTS=1 SPIN_RESUME_FROM="$best" \
  SPIN_RESUME_PART=1 SPIN_CHI=64 SPIN_LAYERS=200 SPIN_SUFF=8e-3 \
  timeout $(( end - now )) python benchmarks/spin_chain.py 50 5 0.2
