# fig5 n=50 1-step hybrid, attempt 3 (attempt 2 wedged 45+ min silent with
# no relay connection after its checkpoint resume; fresh client usually
# recovers after a worker crash). Resumes from the newest checkpoint via
# compile_with_recovery.
cd /root/repo
SPIN_LOCAL=1 SPIN_LOCAL_WINDOW=8 SPIN_POLISH_FREQ=8 SPIN_CHI=64 \
  SPIN_LAYERS=800 SPIN_SUFF=8e-3 \
  timeout 9000 python benchmarks/spin_chain.py 50 1 0.2
