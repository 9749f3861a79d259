# phase profile of the 2q apply + sweep under the round-5 defaults (teig +
# the rank-deficient svd_trunc fix): teig removed the dense eigh (46% of
# the standalone apply) but the n=50 sweep only moved 15.3k -> 16.1k
# evals/s, so the sweep-level wall is elsewhere — locate it (VERDICT r4
# next #3: >= 25k evals/s or a documented measured dead-end).
cd /root/repo
PROFILE_CHI=64 timeout 1800 python benchmarks/apply_profile.py \
  > /tmp/apply_profile_r5.log 2>&1
tail -30 /tmp/apply_profile_r5.log
