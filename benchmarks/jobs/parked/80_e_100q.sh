# 100q long-budget attempt, HYBRID local-cost schedule (the global-cost
# 800-layer run reached 0.32; barren-plateau trainability is worst at
# n=100). Checkpointed; retries resume.
cd /root/repo
RMPS_N=100 RMPS_LOCAL=1 RMPS_LOCAL_WINDOW=8 RMPS_POLISH_FREQ=8 \
  RMPS_LAYERS=1600 timeout 10800 python benchmarks/random_mps.py 1
