"""Self-contained OpenQASM 2.0 export/import for the gate-list IR.

Replaces the reference's qiskit.qasm2 dependency (adapt_compiler.py:361-365,
473) so AdaptResult.circuit_qasm and circuit history snapshots keep working
without qiskit at runtime.
"""

from __future__ import annotations

import re

from .circuit import Circuit, Instruction, create_1q_gate

_QASM_GATES = {"rx", "ry", "rz", "cx", "cz", "h", "x", "y", "z", "s", "sdg",
               "t", "tdg", "swap", "u3"}


def dumps(circuit: Circuit) -> str:
    lines = ['OPENQASM 2.0;', 'include "qelib1.inc";',
             f'qreg q[{circuit.num_qubits}];']
    if circuit.num_clbits:
        lines.append(f'creg c[{circuit.num_clbits}];')
    for instr in circuit.data:
        name = instr.name
        if name == "barrier":
            qs = ",".join(f"q[{q}]" for q in instr.qubits)
            lines.append(f"barrier {qs};")
            continue
        if name == "measure":
            lines.append(f"measure q[{instr.qubits[0]}] -> c[{instr.clbits[0]}];")
            continue
        if name in ("set_statevector", "set_mps"):
            lines.append(f"// <{name} instruction omitted>")
            continue
        if name not in _QASM_GATES:
            raise ValueError(f"cannot serialise {name} to QASM2")
        params = ""
        if instr.params:
            params = "(" + ",".join(repr(float(p)) for p in instr.params) + ")"
        qs = ",".join(f"q[{q}]" for q in instr.qubits)
        lines.append(f"{name}{params} {qs};")
    return "\n".join(lines) + "\n"


_LINE_RE = re.compile(
    r"^\s*(?P<name>[a-z][a-z0-9_]*)\s*(\((?P<params>[^)]*)\))?\s+(?P<args>[^;]+);")


def loads(text: str) -> Circuit:
    """Minimal QASM2 parser covering what dumps() produces."""
    num_qubits = num_clbits = 0
    body = []
    for raw in text.splitlines():
        line = raw.split("//")[0].strip()
        if not line or line.startswith(("OPENQASM", "include")):
            continue
        m = re.match(r"qreg\s+\w+\[(\d+)\]", line)
        if m:
            num_qubits = int(m.group(1))
            continue
        m = re.match(r"creg\s+\w+\[(\d+)\]", line)
        if m:
            num_clbits = int(m.group(1))
            continue
        body.append(line)
    qc = Circuit(num_qubits, num_clbits)
    for line in body:
        m = re.match(r"measure\s+\w+\[(\d+)\]\s*->\s*\w+\[(\d+)\]\s*;", line)
        if m:
            qc.measure(int(m.group(1)), int(m.group(2)))
            continue
        m = _LINE_RE.match(line)
        if not m:
            raise ValueError(f"cannot parse QASM line: {line}")
        name = m.group("name")
        params = tuple(float(eval(p, {"pi": 3.141592653589793}))  # noqa: S307
                       for p in (m.group("params") or "").split(",") if p.strip())
        qubits = tuple(int(x) for x in re.findall(r"\[(\d+)\]", m.group("args")))
        if name == "barrier":
            qc.barrier(*qubits)
        elif name in ("rx", "ry", "rz"):
            qc.data.append(create_1q_gate(name, params[0], qubits[0]))
        else:
            qc.data.append(Instruction(name, qubits, params))
    return qc
