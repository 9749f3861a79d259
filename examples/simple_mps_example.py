"""50-qubit MPS example (mirror of examples/simple_mps_example.py): a large
circuit where only some qubits are entangled, compiled with the MPS engine."""

import logging

from adaptaqc_tpu import AdaptCompiler, MPSBackend, Circuit

logging.basicConfig()
logging.getLogger("adaptaqc_tpu").setLevel(logging.INFO)

n = 50
qc = Circuit(n)
qc.h(0)
qc.cx(0, 1)
qc.h(2)
qc.cx(2, 3)
qc.h(range(4, n))

# Default MPS backend has very minimal truncation.
adapt_compiler = AdaptCompiler(qc, backend=MPSBackend())

result = adapt_compiler.compile()
print(f"Overlap between circuits is {result.overlap}")
