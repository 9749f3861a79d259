# iterate the winning recipe: global chi=64 refine of the best 1-step
# circuit (0.8953 -> 0.9269 in 21 min last round); picks up best on record
cd /root/repo
SPIN_REFINE_CHI=64 SPIN_REFINE_LAYERS=400 SPIN_REFINE_SUFF=8e-3 \
  timeout 5400 python benchmarks/spin_refine.py 50 1 0.2
