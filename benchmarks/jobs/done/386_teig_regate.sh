# re-run the rewritten teig gate (f64-truth-based; the original embed-as-
# reference gate was failing on the baseline's own wide-spectrum error).
# On pass, /tmp/teig_ok lets later queue jobs opt in to ADAPTAQC_EIGH=teig.
cd /root/repo
rm -f /tmp/teig_ok
timeout 1200 python benchmarks/teig_check.py > /tmp/teig_check.log 2>&1
rc=$?
grep -E "OK|FAIL" /tmp/teig_check.log
[ $rc -eq 0 ] && touch /tmp/teig_ok
exit $rc
