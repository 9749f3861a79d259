"""Compile a random 4-qubit state (mirror of examples/simple_sv_example.py)."""

import logging

import adaptaqc_tpu.utils.circuit_operations as co
from adaptaqc_tpu import AdaptCompiler

logging.basicConfig()
logging.getLogger("adaptaqc_tpu").setLevel(logging.INFO)

qc = co.create_random_initial_state_circuit(4, seed=0)

adapt_compiler = AdaptCompiler(qc)
result = adapt_compiler.compile()
approx_circuit = result.circuit
print(f"Overlap between circuits is {result.overlap}")
print(f'{"-" * 10}ADAPT-AQC  CIRCUIT{"-" * 10}')
print(approx_circuit)
