cd /root/repo
SPIN_REFINE_CHI=64 SPIN_REFINE_LAYERS=400 SPIN_REFINE_SUFF=8e-3 \
  timeout 5400 python benchmarks/spin_refine.py 50 1 0.2
