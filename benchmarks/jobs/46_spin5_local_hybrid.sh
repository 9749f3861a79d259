# fig5 n=50 5-step (t=1.0): HYBRID local-cost compile — same schedule that
# job 45 runs for 1-step (local per-qubit cost, chunked O(W^2) window-8
# sweep, global-cost window-100 polish every 8 layers). The 5-step target
# was at overlap 0.0025 with pure global cost (VERDICT r4 missing #1);
# the barren-plateau diagnosis says the local cost is the fix.
[ -e /tmp/teig_ok ] && export ADAPTAQC_EIGH=teig
# Checkpoints every 50 layers; jobrunner retries resume cross-process.
cd /root/repo
SPIN_LOCAL=1 SPIN_LOCAL_WINDOW=8 SPIN_POLISH_FREQ=8 SPIN_CHI=64 \
  SPIN_LAYERS=800 SPIN_SUFF=8e-3 \
  timeout 10800 python benchmarks/spin_chain.py 50 5 0.2
