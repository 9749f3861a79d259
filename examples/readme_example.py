"""Minimal example (mirror of reference examples/readme_example.py)."""

import logging

from adaptaqc_tpu import AdaptCompiler, Circuit

logging.basicConfig()
logging.getLogger("adaptaqc_tpu").setLevel(logging.INFO)

# Setup the circuit
qc = Circuit(3)
qc.rx(1.23, 0)
qc.cx(0, 1)
qc.ry(2.5, 1)
qc.rx(-1.6, 2)
qc.ccx(2, 1, 0)

# Compile
compiler = AdaptCompiler(qc)
result = compiler.compile()
compiled_circuit = result.circuit

print(f'{"-" * 10} ORIGINAL CIRCUIT {"-" * 10}')
print(qc)
print(f'{"-" * 10} RECOMPILED CIRCUIT {"-" * 10}')
print(compiled_circuit)
print(f"Overlap between circuits is {result.overlap}")
