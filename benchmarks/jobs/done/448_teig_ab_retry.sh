# fill in A/B measurements job 44's 900s timeouts cut off (fresh n=50
# chi=128 / teig sweep programs spend ~15 min in relay compiles; completed
# compiles are persistently cached so re-runs are fast). Re-does the
# teig_ok decision from the union of rows.
cd /root/repo
have() { grep -q "\"impl\": \"$1\", \"chi\": $2, \"ms_per_sweep\"" /tmp/eigh_ab_r5.jsonl 2>/dev/null; }
for i in pallas teig; do
  for c in 64 128; do
    have $i $c && continue
    timeout 2400 python benchmarks/eigh_ab.py $i $c 2>/dev/null \
      >> /tmp/eigh_ab_r5.jsonl
  done
done
cat /tmp/eigh_ab_r5.jsonl
python - << 'PY'
import json
rows = {}
for line in open("/tmp/eigh_ab_r5.jsonl"):
    try:
        r = json.loads(line)
    except ValueError:
        continue
    if r.get("bench") == "sweep50":
        rows[(r["impl"], r["chi"])] = r["evals_per_sec"]
p, t = rows.get(("pallas", 64)), rows.get(("teig", 64))
print("sweep50 evals/s:", rows)
if p and t and t >= 0.97 * p:
    open("/tmp/teig_ok", "w").write(f"teig {t} vs pallas {p}\n")
    print("teig_ok: teig wins/ties at chi=64")
else:
    print("teig stays off (slower at chi=64 or unmeasured)")
PY
