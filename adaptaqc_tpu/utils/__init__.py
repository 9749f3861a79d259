from . import ansatzes, constants, entanglement_measures, hamiltonians
