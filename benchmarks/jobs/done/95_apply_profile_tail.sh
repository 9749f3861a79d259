# Best-effort tail profile (VERDICT r4 #3): teig removed the dense eigh
# (46% of the standalone 2q apply) but the n=50 sweep only moved 15.3k ->
# 16.1k evals/s — locate where the sweep-level wall actually is. Runs only
# if a window remains after the seed tail; losing it to the round-end
# bench costs nothing (the log lands in benchmarks/ as it streams).
cd /root/repo
[ "$(date +%s)" -ge "$(date -d "2026-08-21 03:35 UTC" +%s)" ] && { echo "profile tail: no window"; exit 0; }
PROFILE_CHI=64 timeout 1500 python benchmarks/apply_profile.py \
  2>&1 | tee benchmarks/apply_profile_r5.log
