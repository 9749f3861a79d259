# fig5 n=50 5-step (t=1.0): HYBRID local-cost compile — same schedule as
# the 1-step job (local per-qubit cost, chunked O(W^2) window-8 sweep,
# global-cost window-100 polish every 8 layers). The 5-step target was at
# overlap 0.0025 with pure global cost (VERDICT r4 missing #1); the
# barren-plateau diagnosis says the local cost is the fix.
# Final-session timing: ADAPTAQC_WALL_DEADLINE stops the layer loop at
# 03:05 UTC with the best-so-far ansatz so verification + the record
# always land before the driver's round-end bench; the timeout at 03:50 is
# only a backstop for a wedged verification.
# Checkpoints every 50 layers; jobrunner retries resume cross-process.
cd /root/repo
now=$(date +%s)
ddl=$(date -d "2026-08-21 03:05 UTC" +%s)
end=$(date -d "2026-08-21 03:50 UTC" +%s)
[ "$end" -le "$now" ] && { echo "spin5: no window left $(date)"; exit 0; }
[ "$ddl" -le "$now" ] && ddl=$(( now + 600 ))
ADAPTAQC_WALL_DEADLINE=$ddl SPIN_LOCAL=1 SPIN_LOCAL_WINDOW=8 \
  SPIN_POLISH_FREQ=8 SPIN_CHI=64 SPIN_LAYERS=800 SPIN_SUFF=8e-3 \
  timeout $(( end - now )) python benchmarks/spin_chain.py 50 5 0.2
