# teig on-device A/B: tridiag+dense-eigh vs tridiag+teig (committed 817f3df)
cd /root/repo
PROFILE_CHI=64 timeout 900 python benchmarks/apply_profile.py \
  > /tmp/apply_profile_r4.log 2>&1
