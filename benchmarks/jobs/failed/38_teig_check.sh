# on-device teig correctness gate (see benchmarks/teig_check.py).
# On pass, /tmp/teig_ok lets later queue jobs opt in to ADAPTAQC_EIGH=teig
# before the code default flips (the flip itself is a reviewed commit).
cd /root/repo
rm -f /tmp/teig_ok
timeout 900 python benchmarks/teig_check.py > /tmp/teig_check.log 2>&1
rc=$?
cat /tmp/teig_check.log
[ $rc -eq 0 ] && touch /tmp/teig_ok
exit $rc
