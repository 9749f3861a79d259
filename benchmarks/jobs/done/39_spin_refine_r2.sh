# fig5 n=50 1-step: FULL-WINDOW chi=64 refine of the current best (0.9269).
# The 0.9269 record used rotosolve_window=100 on a ~490-layer circuit, so
# ~80% of its gates were frozen forever; the O(G) fused device sweep makes
# a full-circuit rotosolve cycle ~0.6 s at ~1300 gates, so joint
# re-optimisation is affordable. Bounded at 75 min (first compile of the
# big-window program may cost ~15 min through the relay; cached after).
cd /root/repo
[ -e /tmp/teig_ok ] && export ADAPTAQC_EIGH=teig
SPIN_REFINE_CHI=64 SPIN_REFINE_LAYERS=150 SPIN_REFINE_SUFF=8e-3 \
  SPIN_REFINE_WINDOW=2000 \
  timeout 4500 python benchmarks/spin_refine.py 50 1 0.2 || true
