# Apply/sweep phase profile under the round-5 defaults (teig + svd_trunc
# column-norm fix): locate where the sweep-level wall sits now that the
# dense eigh (46% of the standalone apply) is gone but the n=50 sweep only
# moved 15.3k -> 16.1k evals/s (VERDICT r4 #3). Log lands in benchmarks/.
cd /root/repo
PROFILE_CHI=64 timeout 1800 python benchmarks/apply_profile.py \
  2>&1 | tee benchmarks/apply_profile_r5.log
