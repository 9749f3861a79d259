# n=8 re-run AFTER the verifier eigh pin (the 4535 run started before the
# fix landed, so its cross-engine check may still read 0.0). Skips itself
# once any n8 record carries a sane engine check; compile cache is warm
# from 4535 so a re-run costs only a few minutes.
cd /root/repo
python3 - <<'PY' && exit 0
import json, sys
ok = False
for line in open('benchmarks/results_spin_chain.jsonl'):
    try:
        r = json.loads(line)
    except ValueError:
        continue
    if not r.get('workload', '').startswith('xxz_trotter_n8'):
        continue
    ovs = [v for v in (r.get('overlap'), r.get('independent_overlap'),
                       r.get('independent_engine_overlap')) if v is not None]
    # a trustworthy n8 row needs a record whose STRICTEST check clears the
    # bar (the 4535 attempt lost its compile time to the wall deadline and
    # may have recorded an early-stop junk solution)
    if ovs and min(ovs) > 0.97:
        ok = True
sys.exit(0 if ok else 1)
PY
[ "$(date +%s)" -ge "$(date -d "2026-08-21 02:10 UTC" +%s)" ] && { echo "n8 recheck: no window"; exit 0; }
ADAPTAQC_WALL_DEADLINE=$(( $(date +%s) + 1100 )) SPIN_CHI=32 \
  timeout 1800 python benchmarks/spin_chain.py 8 1 0.2
