# fig5 n=50 1-step: one bounded chi=64 global refine round of the current
# best (0.9269). Bounded at 70 min so the seed sprint still runs this
# round; a further round (42_) re-checks the >0.99 stop condition.
cd /root/repo
[ -e /tmp/teig_ok ] && export ADAPTAQC_EIGH=teig
SPIN_REFINE_CHI=64 SPIN_REFINE_LAYERS=400 SPIN_REFINE_SUFF=8e-3 \
  timeout 4200 python benchmarks/spin_refine.py 50 1 0.2 || true
