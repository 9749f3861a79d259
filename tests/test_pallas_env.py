"""Pallas fused env-chain kernel vs the XLA reference path (interpret mode
on CPU; the same kernel compiles natively on TPU where it is ~2.5x faster
per probe)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from adaptaqc_tpu.backends import mps_core
from adaptaqc_tpu.circuits.circuit import Circuit
from adaptaqc_tpu.circuits.tape import compile_tape
from adaptaqc_tpu.ops import cplx, pallas_env


def _rand_state(n, chi, seed, dtype=jnp.float32):
    rng = np.random.default_rng(seed)
    qc = Circuit(n)
    for _ in range(2):
        for q in range(n):
            qc.ry(float(rng.uniform(-3, 3)), q)
        for q in range(n - 1):
            qc.cx(q, q + 1)
    tape = compile_tape(qc)
    return mps_core.apply_tape(
        mps_core.zero_mps(n, chi, dtype), jnp.asarray(tape.kinds),
        jnp.asarray(tape.q0), jnp.asarray(tape.q1),
        jnp.asarray(tape.angles).astype(dtype), 1e-12)


@pytest.mark.parametrize("q", [0, 3, 7])
def test_matches_xla_reference(q):
    n, chi = 8, 8
    r_state = _rand_state(n, chi, 1)
    l_state = _rand_state(n, chi, 2)
    ref = cplx.to_np(mps_core.local_overlap_matrix(r_state, l_state,
                                                   jnp.int32(q)))
    out = cplx.to_np(pallas_env.env_chain(
        mps_core.b_tensors(r_state), mps_core.b_tensors(l_state), q,
        interpret=True))
    assert np.abs(out - ref).max() < 1e-5


def test_supported_gating():
    assert pallas_env.supported(50, 64, jnp.float32)
    assert not pallas_env.supported(50, 64, jnp.float64)   # f32 only
    assert not pallas_env.supported(50, 6, jnp.float32)    # lane alignment
    assert not pallas_env.supported(400, 128, jnp.float32)  # VMEM budget


def test_engine_cache_and_dispatch():
    e1 = mps_core.sweep_engine(1e-10)
    e2 = mps_core.sweep_engine(1e-10)
    assert e1 is e2  # fresh closures would retrace every jitted sweep
    e3 = mps_core.sweep_engine(1e-10, allow_pallas=False)
    assert e3.local_overlap is mps_core.local_overlap_matrix
