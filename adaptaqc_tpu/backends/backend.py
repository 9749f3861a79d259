"""Backend layer: the AQCBackend contract + TPU engine adapters.

Mirrors the reference backend stack (/root/reference/adaptaqc/backends/):
 - AQCBackend ABC: aqc_backend.py:14-29 (evaluate_global_cost,
   evaluate_local_cost, evaluate_circuit, measure_qubit_expectation_values)
 - SVBackend ~ AerSVBackend (aer_sv_backend.py)
 - MPSBackend ~ AerMPSBackend + mps_sim_with_args (aer_mps_backend.py)
 - SamplingBackend ~ QiskitSamplingBackend (qiskit_sampling_backend.py)

Design inversion vs the reference: backends do not "run a circuit object in
an external simulator"; they hold jit caches and evaluate tapes against a
cached on-device prefix state, so a cost query after the prefix is a single
device call and adaptive growth never recompiles (tape length buckets).
"""

from __future__ import annotations

import logging
from abc import ABC, abstractmethod
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..circuits.circuit import Circuit
from ..circuits.tape import Tape, compile_tape
from ..ops import cplx
from . import mps_core, sv_core

logger = logging.getLogger(__name__)

DEFAULT_MAX_CHI = 64
DEFAULT_TRUNCATION_THRESHOLD = 1e-16


class AQCBackend(ABC):
    """Backend contract (aqc_backend.py:14-29)."""

    @abstractmethod
    def evaluate_global_cost(self, compiler):
        ...

    @abstractmethod
    def evaluate_local_cost(self, compiler):
        ...

    @abstractmethod
    def evaluate_circuit(self, compiler):
        ...

    @abstractmethod
    def measure_qubit_expectation_values(self, compiler):
        ...


def _tape_args(tape: Tape):
    return (jnp.asarray(tape.kinds), jnp.asarray(tape.q0),
            jnp.asarray(tape.q1), jnp.asarray(tape.angles))


class SVBackend(AQCBackend):
    """Statevector cost engine (AerSVBackend analogue).

    :param mesh: optional jax.sharding.Mesh with ("dp", "tp") axes. When set,
        every engine state is tp-sharded over its amplitude axis and pair
        batches are dp-sharded, so the compiler's jitted sweeps and RDM
        scoring run as GSPMD programs over the mesh (SURVEY.md section 2.7's
        TPU-native parallelism). Results are identical to the unsharded
        engine (tests/test_mesh.py asserts this).
    """

    engine_name = "sv"

    def __init__(self, mesh=None):
        self.mesh = mesh
        self._jit_cache = {}

    def _shard(self, state):
        if self.mesh is None:
            return state
        from ..parallel import mesh as pmesh
        return pmesh.shard_state(self.mesh, state)

    # ------------------------------------------------------- engine plumbing
    def initial_state(self, circuit: Circuit, n: int):
        """Engine state for the leading state-injection instruction (if any)."""
        if circuit.data and circuit.data[0].name == "set_statevector":
            return self._shard(sv_core.state_from_vector(circuit.data[0].payload))
        if circuit.data and circuit.data[0].name == "set_mps":
            raise ValueError("SV backend cannot consume an MPS target")
        return self._shard(sv_core.zero_state(n))

    def run_tape(self, state, tape: Tape):
        key = ("run", tape.padded_length, state.re.shape)
        fn = self._jit_cache.get(key)
        if fn is None:
            fn = jax.jit(sv_core.apply_tape)
            self._jit_cache[key] = fn
        return fn(state, *_tape_args(tape))

    def run_tape_adjoint(self, state, tape: Tape):
        key = ("runadj", tape.padded_length, state.re.shape)
        fn = self._jit_cache.get(key)
        if fn is None:
            fn = jax.jit(sv_core.apply_tape_adjoint)
            self._jit_cache[key] = fn
        return fn(state, *_tape_args(tape))

    def state_of(self, compiler):
        return compiler._current_state()

    def sweep_engine(self):
        return sv_core.sweep_engine()

    def zero_ref(self, compiler):
        return self._shard(sv_core.zero_state(compiler.full_circuit.num_qubits))

    # ----------------------------------------------------------- cost layer
    def evaluate_global_cost(self, compiler):
        state = self.state_of(compiler)
        if not compiler.soften_global_cost:
            return float(sv_core.global_cost(state))
        # Deviation from the reference (aer_sv_backend.py raises here): the
        # hamming-1 softening terms are directly computable on a
        # statevector, and the full-cost device sweep already optimises
        # them on this engine, so the host cost layer matches it.
        # history only exists once compile() starts (reference parity:
        # adapt_compiler.py:284 initialises it there too) — a pre-compile
        # evaluate_cost() behaves as a first evaluation
        history = getattr(compiler, "global_cost_history", [])
        previous_cost = history[-1] if history else 1
        alpha = abs(previous_cost - compiler.adapt_config.sufficient_cost)
        n = compiler.full_circuit.num_qubits
        g, _loc, h1 = sv_core.full_cost_terms(state, sv_core.zero_state(
            n, state.dtype))
        return float(g) - alpha * float(h1)

    def evaluate_local_cost(self, compiler):
        e_vals = self.measure_qubit_expectation_values(compiler)
        return float(0.5 * (1 - np.mean(e_vals)))

    def evaluate_circuit(self, compiler):
        return self.state_of(compiler)

    def measure_qubit_expectation_values(self, compiler):
        state = self.state_of(compiler)
        n = compiler.full_circuit.num_qubits
        return list(np.asarray(sv_core.z_expectations(state, n)))

    # -------------------------------------------------------- analysis layer
    def all_pair_rdms(self, state, pairs: np.ndarray):
        n_pairs = len(pairs)
        if self.mesh is not None:
            from ..parallel import mesh as pmesh
            pairs_dev, n_pairs = pmesh.shard_pairs(self.mesh, pairs)
        else:
            pairs_dev = jnp.asarray(pairs, jnp.int32)
        key = ("rdms", state.re.shape, pairs_dev.shape)
        fn = self._jit_cache.get(key)
        if fn is None:
            fn = jax.jit(sv_core.all_pair_rdms)
            self._jit_cache[key] = fn
        rhos = fn(state, pairs_dev)
        return [cplx.to_np(rhos[i]) for i in range(n_pairs)]

    def two_qubit_rdm(self, circuit_or_compiler, q1, q2, state=None):
        if state is None:
            state = self.state_of(circuit_or_compiler)
        lo, hi = min(q1, q2), max(q1, q2)
        return cplx.to_np(sv_core.rdm2(state, lo, hi))

    def statevector(self, compiler) -> np.ndarray:
        return cplx.to_np(self.state_of(compiler))


class MPSBackend(AQCBackend):
    """MPS cost engine (AerMPSBackend analogue).

    :param truncation_threshold: singular values below this are discarded
        (matrix_product_state_truncation_threshold, aer_mps_backend.py:27-42)
    :param max_chi: padded bond dimension; the engine truncates to it
        (matrix_product_state_max_bond_dimension). Static for XLA. NOTE: the
        reference's Aer default is an UNBOUNDED bond dimension; static TPU
        shapes force a cap (DEFAULT_MAX_CHI when unset). The engine tracks
        the Schmidt weight each truncation discards (MPS.trunc) and
        `truncated_weight` / the compiler's end-of-run warning surface it, so
        a binding cap is never silent.
    :param mps_log_data: when True, log the accumulated discarded weight
        after every tape execution (Aer's mps_log_data analogue). Costs one
        device sync per run_tape call — keep off in production runs.
    :param mesh: optional jax.sharding.Mesh with ("dp", "tp") axes: MPS
        tensors tp-shard over the bond (chi) axis, so the chi^3 environment
        matmuls in sweeps and observables partition over the mesh — the path
        to chi beyond single-chip HBM. Results match the unsharded engine.
    """

    engine_name = "mps"

    def __init__(self, truncation_threshold: float = DEFAULT_TRUNCATION_THRESHOLD,
                 max_chi: Optional[int] = None, mps_log_data: bool = False,
                 mesh=None):
        self.truncation_threshold = float(truncation_threshold)
        self.max_chi = max_chi
        self.mps_log_data = mps_log_data
        self.mesh = mesh
        self._jit_cache = {}

    def _shard(self, state):
        if self.mesh is None:
            return state
        from ..parallel import mesh as pmesh
        return pmesh.shard_mps(self.mesh, state)

    @staticmethod
    def truncated_weight(state) -> float:
        """Total relative Schmidt weight discarded across all 2q applies that
        produced `state` (0 when neither the chi cap nor the threshold ever
        bound). Forces a device sync."""
        return float(state.trunc)

    def chi_for(self, n: int) -> int:
        cap = self.max_chi or DEFAULT_MAX_CHI
        full = 2 ** ((n + 1) // 2)
        return int(min(cap, max(2, full)))

    def initial_state(self, circuit: Circuit, n: int):
        chi = self.chi_for(n)
        if circuit.data and circuit.data[0].name == "set_mps":
            payload = circuit.data[0].payload
            if isinstance(payload, mps_core.MPS):
                if payload.chi != chi:
                    raise ValueError("cached MPS chi mismatch")
                return self._shard(payload)
            return self._shard(mps_core.from_qiskit_mps(payload, chi))
        if circuit.data and circuit.data[0].name == "set_statevector":
            # Aer's MPS simulator consumes initialize/set_statevector targets
            # directly; import the dense vector via sequential SVDs
            return self._shard(mps_core.from_dense(circuit.data[0].payload,
                                                   chi))
        return self._shard(mps_core.zero_mps(n, chi))

    def run_tape(self, state, tape: Tape):
        key = ("run", tape.padded_length, state.chi, state.n)
        fn = self._jit_cache.get(key)
        if fn is None:
            thr = self.truncation_threshold
            fn = jax.jit(lambda s, k, a, b, th: mps_core.apply_tape(
                s, k, a, b, th, thr))
            self._jit_cache[key] = fn
        out = fn(state, *_tape_args(tape))
        if self.mps_log_data:
            logger.info("mps_log_data: accumulated discarded Schmidt weight "
                        f"= {float(out.trunc):.3e} (chi={out.chi})")
        return out

    def run_tape_adjoint(self, state, tape: Tape):
        key = ("runadj", tape.padded_length, state.chi, state.n)
        fn = self._jit_cache.get(key)
        if fn is None:
            thr = self.truncation_threshold
            fn = jax.jit(lambda s, k, a, b, th: mps_core.apply_tape_adjoint(
                s, k, a, b, th, thr))
            self._jit_cache[key] = fn
        return fn(state, *_tape_args(tape))

    def state_of(self, compiler):
        return compiler._current_state()

    def sweep_engine(self):
        # pallas kernels and the incremental-env while loops are
        # single-device programs; sharded runs stay on the
        # GSPMD-partitionable XLA scan path
        return mps_core.sweep_engine(
            self.truncation_threshold,
            allow_pallas=self.mesh is None,
            # None = consult ADAPTAQC_ENVCACHE; sharded runs always use the
            # GSPMD-partitionable full-chain path
            allow_env_cache=None if self.mesh is None else False)

    def zero_ref(self, compiler):
        n = compiler.full_circuit.num_qubits
        return self._shard(mps_core.zero_mps(n, self.chi_for(n)))

    # ----------------------------------------------------------- cost layer
    def evaluate_global_cost(self, compiler):
        state = self.state_of(compiler)
        # Normalised by <psi|psi>: long f32 apply chains with a chi buffer
        # well above the state's true rank accumulate a pure SCALE drift
        # (the Gram-eigh noise floor corrupts snorm while leaving the state
        # direction intact to ~1e-6 — measured norm^2 up to 1.18 at chi=128,
        # n=50). Aer needs no such guard (f64, exact-rank bonds); cost
        # semantics follow aer_mps_backend.py:49-57 on the normalised state.
        # One fused device program: per-call relay sync is ~33-70 ms.
        if not compiler.soften_global_cost:
            return float(mps_core.global_cost_normalized(state))
        history = getattr(compiler, "global_cost_history", [])
        previous_cost = history[-1] if history else 1
        alpha = abs(previous_cost - compiler.adapt_config.sufficient_cost)
        cost, h1_sum = mps_core.softened_cost_terms(state)
        return float(cost) - alpha * float(h1_sum)

    def evaluate_local_cost(self, compiler):
        evals = self.measure_qubit_expectation_values(compiler)
        return float(0.5 * (1 - np.mean(evals)))

    def evaluate_circuit(self, compiler):
        return self.state_of(compiler)

    def measure_qubit_expectation_values(self, compiler):
        state = self.state_of(compiler)
        return list(np.asarray(mps_core.z_expectations(state)))

    # -------------------------------------------------------- analysis layer
    def all_pair_rdms(self, state, pairs: np.ndarray):
        key = ("rdms", state.n, state.chi)
        fn = self._jit_cache.get(key)
        if fn is None:
            fn = jax.jit(mps_core.all_pair_rdms)
            self._jit_cache[key] = fn
        rhos = fn(state)  # (n, n, 4, 4), [i, j] valid for j > i
        out = []
        for (a, b) in pairs:
            lo, hi = min(a, b), max(a, b)
            out.append(cplx.to_np(rhos[lo, hi]))
        return out

    def two_qubit_rdm(self, circuit_or_compiler, q1, q2, state=None):
        if state is None:
            state = self.state_of(circuit_or_compiler)
        lo, hi = min(q1, q2), max(q1, q2)
        rhos = mps_core.all_pair_rdms(state)
        return cplx.to_np(rhos[lo, hi])

    def mps_from_compiler_target(self, circuit: Circuit, start_state=None):
        """Simulate a target circuit into an MPS (the reference's
        mps_from_circuit precompute, approximate_compiler.py:196-204).
        `start_state` extends an existing target MPS by the circuit's gates
        instead of starting from |0..0> (incremental ladder prefixes)."""
        n = circuit.num_qubits
        state = (start_state if start_state is not None
                 else self.initial_state(circuit, n))
        start = 1 if (circuit.data and circuit.data[0].name in
                      ("set_mps", "set_statevector")) else 0
        tape = compile_tape(circuit, (start, len(circuit.data)))
        return self.run_tape(state, tape)


class SamplingBackend(AQCBackend):
    """Shot-based cost estimates via categorical sampling from engine
    probabilities (QiskitSamplingBackend analogue; the 'QASM' backend)."""

    engine_name = "sampling"

    def __init__(self, shots: int = 8192, seed: int = 0):
        self.shots = shots
        self._sv = SVBackend()
        self._key = jax.random.PRNGKey(seed)
        self.host_rng = np.random.default_rng(seed)
        self._jit_cache = {}

    def _next_key(self):
        self._key, sub = jax.random.split(self._key)
        return sub

    # engine plumbing delegates to the statevector engine
    def initial_state(self, circuit, n):
        return self._sv.initial_state(circuit, n)

    def run_tape(self, state, tape):
        return self._sv.run_tape(state, tape)

    def run_tape_adjoint(self, state, tape):
        return self._sv.run_tape_adjoint(state, tape)

    def state_of(self, compiler):
        return compiler._current_state()

    def sweep_engine(self):
        return None  # no closed-form fast path for shot-based costs

    def zero_ref(self, compiler):
        return self._sv.zero_ref(compiler)

    def _noise_model_of(self, compiler):
        execute_kwargs = getattr(compiler, "execute_kwargs", None) or {}
        return execute_kwargs.get("noise_model")

    def _noisy_state(self, compiler, noise_model):
        """One Monte-Carlo Kraus trajectory of the full circuit under the
        thermal-relaxation model: state-dependent amplitude-damping jumps +
        dephasing Z flips after every gate, simulated exactly on the host
        in f64 (circuits/running.simulate_noise_trajectory). The reference
        instead threads execute_kwargs["noise_model"] into Aer's
        density-matrix noise (approximate_compiler.py:92-94, 261-266);
        trajectory sampling is the statevector-engine equivalent and its
        trajectory average matches Aer's channel (tests/test_interactions.py
        TestKrausChannelFidelity)."""
        from ..circuits.operations import make_quantum_only_circuit
        from ..circuits.running import simulate_noise_trajectory
        from ..ops import cplx
        qc = make_quantum_only_circuit(compiler.full_circuit)
        sv = simulate_noise_trajectory(qc, noise_model, self.host_rng)
        return cplx.from_np(sv)

    def counts(self, compiler, shots: Optional[int] = None,
               num_trajectories: int = 8):
        """Sampled counts dict {bitstring: count}, bitstrings with qubit 0 as
        the RIGHTMOST character (qiskit convention). With a noise model in
        the compiler's execute_kwargs, shots are split across Monte-Carlo
        noise trajectories of the full circuit."""
        noise_model = self._noise_model_of(compiler)
        if noise_model is not None:
            shots = shots or self.shots
            per_traj = [shots // num_trajectories] * num_trajectories
            per_traj[0] += shots - sum(per_traj)
            n = compiler.full_circuit.num_qubits
            merged = {}
            for traj_shots in per_traj:
                if traj_shots == 0:
                    continue
                state = self._noisy_state(compiler, noise_model)
                for key, c in self._sample_state(state, traj_shots, n).items():
                    merged[key] = merged.get(key, 0) + c
            return merged
        state = self.state_of(compiler)
        n = compiler.full_circuit.num_qubits
        return self._sample_state(state, shots or self.shots, n)

    def _sample_state(self, state, shots: int, n: int):
        # categorical draws happen ON DEVICE from unnormalised log-probs, so
        # the host transfer is (shots,) indices rather than the full 2^n
        # probability vector per evaluation
        key = ("sample", state.re.shape, shots)
        fn = self._jit_cache.get(key)
        if fn is None:
            fn = jax.jit(lambda s, k: jax.random.categorical(
                k, jnp.log(s.abs2() + 1e-30), shape=(shots,)))
            self._jit_cache[key] = fn
        draws = np.asarray(fn(state, self._next_key()))
        vals, cnts = np.unique(draws, return_counts=True)
        return {format(int(v), f"0{n}b"): int(c) for v, c in zip(vals, cnts)}

    def evaluate_global_cost(self, compiler):
        if compiler.soften_global_cost:
            raise NotImplementedError(
                "soften_global_cost is currently only implemented for MPSBackend")
        counts = self.counts(compiler)
        n = compiler.full_circuit.num_qubits
        zero = "0" * n
        return 1.0 - counts.get(zero, 0) / sum(counts.values())

    def evaluate_local_cost(self, compiler):
        evals = self.measure_qubit_expectation_values(compiler)
        return float(0.5 * (1 - np.mean(evals)))

    def evaluate_circuit(self, compiler):
        return self.counts(compiler)

    def measure_qubit_expectation_values(self, compiler):
        counts = self.counts(compiler)
        n = compiler.full_circuit.num_qubits
        evals = np.zeros(n)
        total = sum(counts.values())
        for bitstring, c in counts.items():
            for q in range(n):
                bit = bitstring[n - 1 - q]
                evals[q] += (1 if bit == "0" else -1) * c
        return list(evals / total)

    def all_pair_rdms(self, state, pairs: np.ndarray):
        """Shot-based tomography RDMs: the exact per-pair RDMs (batched on
        device) fix the outcome distributions of the 9-setting Pauli
        tomography circuits; multinomial draws from those distributions are
        statistically identical to executing the measurement circuits the
        reference's StateTomography runs (entanglement_measures.py:101-135),
        without 9 device round trips per pair."""
        from ..utils.entanglement_measures import sample_tomography_rdm
        exact = self._sv.all_pair_rdms(state, pairs)
        return [sample_tomography_rdm(rho, self.shots, self.host_rng)
                for rho in exact]

    def two_qubit_rdm(self, circuit_or_compiler, q1, q2, state=None):
        from ..utils.entanglement_measures import sample_tomography_rdm
        if state is None:
            state = self.state_of(circuit_or_compiler)
        exact = self._sv.two_qubit_rdm(None, q1, q2, state=state)
        return sample_tomography_rdm(exact, self.shots, self.host_rng)


class CenterMPSBackend(AQCBackend):
    """Independent second MPS engine behind the backend ABC — the
    ITensorBackend analogue (itensor_backend.py:17-62).

    The reference's ITensorBackend exists to cross-check the primary (Aer)
    MPS engine with an algorithmically independent tensor-network simulator
    (ITensorNetworks.jl via juliacall). This backend plays that role
    TPU-natively: `center_mps.py` is a from-scratch mixed-canonical
    (orthogonality-center) MPS engine in the ITensor idiom, sharing no gauge
    convention or update algebra with `mps_core.py`'s Hastings B-form engine.

    Parity with itensor_backend.py:
      - ctor args (chi, cutoff) match :18 (chi=10_000, cutoff=1e-14); static
        TPU shapes require a finite chi, so the default is DEFAULT_MAX_CHI.
      - evaluate_global_cost = 1 - overlap-with-zero of the normalised state
        (:34-42) and raises on soften_global_cost like :35-38.
      - evaluate_circuit returns the engine MPS (:47-59).
      - the reference raises NotImplementedError for local cost and
        expectation values (:44-45, :61-62); here both work (the engine has
        gauge-agnostic observables), as does ISL-method pair selection via
        all_pair_rdms — deviations that only ADD capability (docs/PARITY.md).
      - no sweep fast path: costs go through the host Rotosolve path, the
        analogue of the reference backend re-simulating per query.
    """

    engine_name = "center_mps"

    def __init__(self, chi: Optional[int] = None, cutoff: float = 1e-14):
        self.chi = chi
        self.cutoff = float(cutoff)
        self._jit_cache = {}

    def chi_for(self, n: int) -> int:
        cap = self.chi or DEFAULT_MAX_CHI
        return int(min(cap, max(2, 2 ** ((n + 1) // 2))))

    # ------------------------------------------------------- engine plumbing
    def initial_state(self, circuit: Circuit, n: int):
        from . import center_mps
        chi = self.chi_for(n)
        if circuit.data and circuit.data[0].name == "set_mps":
            raise ValueError(
                "CenterMPSBackend takes gate-circuit targets (the reference "
                "ITensorBackend likewise prepares its own target MPS)")
        if circuit.data and circuit.data[0].name == "set_statevector":
            return center_mps.from_bform(
                mps_core.from_dense(circuit.data[0].payload, chi))
        return center_mps.zero_cmps(n, chi)

    def run_tape(self, state, tape: Tape):
        from . import center_mps
        key = ("run", tape.padded_length, state.chi, state.n)
        fn = self._jit_cache.get(key)
        if fn is None:
            cut = self.cutoff
            fn = jax.jit(lambda s, k, a, b, th: center_mps.apply_tape(
                s, k, a, b, th, cut))
            self._jit_cache[key] = fn
        return fn(state, *_tape_args(tape))

    def run_tape_adjoint(self, state, tape: Tape):
        from . import center_mps
        key = ("runadj", tape.padded_length, state.chi, state.n)
        fn = self._jit_cache.get(key)
        if fn is None:
            cut = self.cutoff
            fn = jax.jit(lambda s, k, a, b, th: center_mps.apply_tape_adjoint(
                s, k, a, b, th, cut))
            self._jit_cache[key] = fn
        return fn(state, *_tape_args(tape))

    def state_of(self, compiler):
        return compiler._current_state()

    def sweep_engine(self):
        # device O(G) probe sweep over the center-gauge engine — the
        # reference's ITensorBackend has no such path (every cost query is
        # a full Julia re-simulation, itensor_backend.py:34-42), which made
        # this backend unusable beyond toy compiles
        from . import center_mps
        return center_mps.sweep_engine(self.cutoff)

    def zero_ref(self, compiler):
        from . import center_mps
        n = compiler.full_circuit.num_qubits
        return center_mps.zero_cmps(n, self.chi_for(n))

    @staticmethod
    def truncated_weight(state) -> float:
        return float(state.trunc)

    # ----------------------------------------------------------- cost layer
    def evaluate_global_cost(self, compiler):
        from . import center_mps
        if compiler.soften_global_cost:
            raise NotImplementedError(
                "soften_global_cost is currently only implemented for "
                "MPSBackend")  # itensor_backend.py:35-38
        return float(center_mps.global_cost_normalized(self.state_of(compiler)))

    def evaluate_local_cost(self, compiler):
        evals = self.measure_qubit_expectation_values(compiler)
        return float(0.5 * (1 - np.mean(evals)))

    def evaluate_circuit(self, compiler):
        return self.state_of(compiler)

    def measure_qubit_expectation_values(self, compiler):
        from . import center_mps
        return list(np.asarray(center_mps.z_expectations(
            self.state_of(compiler))))

    # -------------------------------------------------------- analysis layer
    def all_pair_rdms(self, state, pairs: np.ndarray):
        from . import center_mps
        key = ("rdms", state.n, state.chi)
        fn = self._jit_cache.get(key)
        if fn is None:
            fn = jax.jit(center_mps.all_pair_rdms)
            self._jit_cache[key] = fn
        rhos = fn(state)
        out = []
        for (a, b) in pairs:
            lo, hi = min(a, b), max(a, b)
            out.append(cplx.to_np(rhos[lo, hi]))
        return out

    def two_qubit_rdm(self, circuit_or_compiler, q1, q2, state=None):
        from . import center_mps
        if state is None:
            state = self.state_of(circuit_or_compiler)
        lo, hi = min(q1, q2), max(q1, q2)
        return cplx.to_np(center_mps.all_pair_rdms(state)[lo, hi])


def mps_backend_with_args(mps_truncation_threshold=DEFAULT_TRUNCATION_THRESHOLD,
                          max_chi=None, mps_log_data=False,
                          **_ignored) -> MPSBackend:
    """mps_sim_with_args analogue (aer_mps_backend.py:27-42)."""
    return MPSBackend(mps_truncation_threshold, max_chi, mps_log_data)


# Default singletons (python_default_backends.py:17-19; CENTER_MPS_SIM is
# the ITENSOR_SIM analogue, julia_default_backends.py:13)
SV_SIM = SVBackend()
MPS_SIM = MPSBackend()
QASM_SIM = SamplingBackend()
CENTER_MPS_SIM = CenterMPSBackend()
