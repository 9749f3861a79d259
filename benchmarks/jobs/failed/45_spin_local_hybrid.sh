# fig5 n=50 1-step: HYBRID local-cost compile — local (per-qubit) cost for
# trainable per-layer signal (chunked O(W^2) sweep, window 8) + global-cost
# window-100 polish every 8 layers (O(G) device sweep). Checkpoints every
# 50 layers; jobrunner retries resume cross-process.
cd /root/repo
[ -e /tmp/teig_ok ] && export ADAPTAQC_EIGH=teig
SPIN_LOCAL=1 SPIN_LOCAL_WINDOW=8 SPIN_POLISH_FREQ=8 SPIN_CHI=64 \
  SPIN_LAYERS=800 SPIN_SUFF=8e-3 \
  timeout 10800 python benchmarks/spin_chain.py 50 1 0.2
