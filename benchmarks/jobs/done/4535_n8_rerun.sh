# Quick n=8 fig5 rerun: the only n8 record predates the svd_trunc
# rank-deficient-bond fix and carries a cross-engine check of 0.0, which
# summarize's strictest-verification rule surfaces as best_verified_overlap
# 0.0 in the fig5 table. A post-fix rerun (n6 took ~120 s on the TPU)
# replaces it and doubles as an end-to-end validation of the fix at n=8.
cd /root/repo
[ "$(date +%s)" -ge "$(date -d "2026-08-21 02:00 UTC" +%s)" ] && { echo "n8 rerun: no window"; exit 0; }
ADAPTAQC_WALL_DEADLINE=$(( $(date +%s) + 700 )) SPIN_CHI=32 \
  timeout 1200 python benchmarks/spin_chain.py 8 1 0.2
