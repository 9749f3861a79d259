from . import (ansatzes, constants, entanglement_measures, fixed_ansatz_circuits,
               gate_tomography, hamiltonians)
