# fine ladder of the 2-step (t=0.4) fig5 target, global cost, with the new
# per-part checkpointing (resume via SPIN_RESUME_FROM/SPIN_RESUME_PART)
cd /root/repo
SPIN_PARTS=1 SPIN_BLOCK_DEPTH=12 SPIN_CHI=64 SPIN_LAYERS=250 SPIN_SUFF=1e-3 \
  timeout 10800 python benchmarks/spin_chain.py 50 2 0.2
