# attribute the teig gate failure: embed vs pallas vs teig singular values
# against f64 host truth on the failing 7-decade-spectrum cases
cd /root/repo
timeout 900 python benchmarks/teig_diag.py > /tmp/teig_diag.log 2>&1
cat /tmp/teig_diag.log
