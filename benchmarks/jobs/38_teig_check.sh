# on-device teig correctness gate (see benchmarks/teig_check.py)
cd /root/repo
timeout 900 python benchmarks/teig_check.py > /tmp/teig_check.log 2>&1
