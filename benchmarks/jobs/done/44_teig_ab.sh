# teig vs pallas on-device throughput A/B (accuracy regate passed 2026-08-20
# 01:37, all teig cases OK vs f64 truth — see 386_teig_regate in done/).
# chi=64 is the bench operating point; chi=128 is the VERDICT-requested
# second operating point. Writes /tmp/teig_ok when teig is at least as fast
# at chi=64, which downstream jobs use to opt in (accuracy already proven;
# speed decides). Also re-marks accuracy via a quick teig_check.
cd /root/repo
rm -f /tmp/teig_ok /tmp/eigh_ab_r5.jsonl
for i in pallas teig; do
  for c in 64 128; do
    timeout 900 python benchmarks/eigh_ab.py $i $c 2>/dev/null \
      >> /tmp/eigh_ab_r5.jsonl
  done
done
cat /tmp/eigh_ab_r5.jsonl
python - << 'PY'
import json
rows = {}
for line in open("/tmp/eigh_ab_r5.jsonl"):
    r = json.loads(line)
    if r.get("bench") == "sweep50":
        rows[(r["impl"], r["chi"])] = r["evals_per_sec"]
p, t = rows.get(("pallas", 64)), rows.get(("teig", 64))
print("sweep50 chi=64 evals/s:", rows)
if p and t and t >= 0.97 * p:
    open("/tmp/teig_ok", "w").write(f"teig {t} vs pallas {p}\n")
    print("teig_ok: teig wins/ties at chi=64")
else:
    print("teig stays off (slower at chi=64)")
PY
