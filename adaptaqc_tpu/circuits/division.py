"""Depth-sliced vertical circuit division (for compile_in_parts).

Mirrors /root/reference/adaptaqc/utils/circuit_operations/
circuit_operations_circuit_division.py:61-144.
"""

from __future__ import annotations

from typing import List

from .circuit import Circuit


def calculate_next_gate_indexes(circuit: Circuit, start_index: int,
                                max_depth: int) -> int:
    """Number of leading gates whose depth stays within max_depth."""
    levels = [0] * circuit.num_qubits
    count = 0
    for instr in circuit.data[start_index:]:
        if instr.name == "barrier":
            count += 1
            continue
        bits = list(instr.qubits)
        level = max((levels[b] for b in bits), default=0) + 1
        if level > max_depth:
            break
        for b in bits:
            levels[b] = level
        count += 1
    return count


def vertically_divide_circuit(circuit: Circuit, max_depth_per_block: int = 10
                              ) -> List[Circuit]:
    """Split into subcircuits each of depth <= max_depth_per_block
    (circuit_division.py:92-144)."""
    parts: List[Circuit] = []
    index = 0
    total = len(circuit.data)
    while index < total:
        take = calculate_next_gate_indexes(circuit, index, max_depth_per_block)
        if take == 0:
            raise ValueError("gate exceeds max_depth_per_block on its own")
        part = Circuit(circuit.num_qubits, circuit.num_clbits)
        part.data = [circuit.data[i].copy() for i in range(index, index + take)]
        parts.append(part)
        index += take
    return parts
