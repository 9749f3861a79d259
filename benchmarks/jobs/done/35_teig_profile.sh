# teig on-device A/B (re-run: first attempt hit the _teig_b0 tracer leak,
# fixed in ops/pallas_eigh.py). Decides whether teig becomes the default
# eigh impl for bench.py.
cd /root/repo
PROFILE_CHI=64 timeout 900 python benchmarks/apply_profile.py \
  > /tmp/apply_profile_r4.log 2>&1
