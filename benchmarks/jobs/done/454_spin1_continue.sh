# Bounded continuation of the fig5 1-step hybrid (job 453). If 453
# finished, compile_with_recovery removed its checkpoint dir and this is a
# no-op. If it crashed or was SIGTERMed by its timeout (which loses the
# record), resume from the newest checkpoint with a wall deadline so a
# record IS written this time: ADAPTAQC_WALL_DEADLINE stops the layer loop
# with the best-so-far ansatz and the harness then verifies + records it.
# Window: up to 80 min, hard-capped at 01:30 UTC with a 15-min floor so
# even a worst-case late start still captures a record for the flagship.
cd /root/repo
ck=benchmarks/checkpoints/spin_n50_s1_chi64_loc1
[ -d "$ck" ] || { echo "spin1 continue: no checkpoint, 453 finished"; exit 0; }
now=$(date +%s)
cap=$(date -d "2026-08-21 01:45 UTC" +%s)
ddl=$(( now + 900 ))
[ "$ddl" -gt "$cap" ] && ddl=$cap
floor=$(( now + 900 ))
[ "$ddl" -lt "$floor" ] && ddl=$floor
echo "spin1 continue: deadline $(date -d @$ddl)"
ADAPTAQC_WALL_DEADLINE=$ddl SPIN_LOCAL=1 SPIN_LOCAL_WINDOW=8 \
  SPIN_POLISH_FREQ=8 SPIN_CHI=64 SPIN_LAYERS=800 SPIN_SUFF=8e-3 \
  timeout $(( ddl - now + 1800 )) python benchmarks/spin_chain.py 50 1 0.2
