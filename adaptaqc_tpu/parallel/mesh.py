"""Multi-chip sharding for ADAPT-AQC.

The reference has no distributed runtime (SURVEY.md section 2.7): its only
parallelism is Aer's intra-simulator OpenMP threading plus fanning whole
compilations across processes. The TPU-native equivalents here:

 - dp axis — candidate-pair scoring (the per-layer heuristic sweep over the
   coupling map, O(n^2) pairs for CMAP_FULL) shards the pairs axis across
   devices; each device scores its pairs against a replicated state.
 - tp axis — the statevector itself shards across devices (the 2^n amplitude
   array over the top qubits), letting compilations exceed single-chip HBM.
   Gate application under jit is partitioned by GSPMD: gathers on sharded
   axes lower to collectives over ICI.

Both axes compose in one `jax.sharding.Mesh`; `training_step` below jits one
full ADAPT optimisation step (Rotoselect sweep + pair scoring) over it.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..backends import sv_core
from ..ops.cplx import C
from ..optim import sweeps


def make_mesh(n_devices: Optional[int] = None,
              axis_names: Tuple[str, str] = ("dp", "tp"),
              shape: Optional[Tuple[int, int]] = None) -> Mesh:
    devices = jax.devices()
    n = n_devices or len(devices)
    if shape is None:
        # favour tp (state sharding) with a modest dp factor
        tp = 1
        while tp * 2 <= n and tp < 4:
            tp *= 2
        dp = n // tp
        shape = (dp, tp)
    mesh_devices = np.asarray(devices[:shape[0] * shape[1]]).reshape(shape)
    return Mesh(mesh_devices, axis_names)


def shard_state(mesh: Mesh, state: C, axis: str = "tp") -> C:
    sh = NamedSharding(mesh, P(axis))
    return C(jax.device_put(state.re, sh), jax.device_put(state.im, sh))


def replicate(mesh: Mesh, x):
    return jax.device_put(x, NamedSharding(mesh, P()))


def shard_pairs(mesh: Mesh, pairs: np.ndarray, axis: str = "dp"):
    return jax.device_put(jnp.asarray(pairs, jnp.int32),
                          NamedSharding(mesh, P(axis, None)))


def pair_purity_scores(state: C, pairs) -> jnp.ndarray:
    """Device-side pair scores: 1 - purity of the 2-site RDM (a monotone
    entanglement proxy used for the sharded scoring path; the exact
    concurrence post-processing stays host-side as in utils/
    entanglement_measures.py)."""
    rhos = sv_core.all_pair_rdms(state, pairs)  # C (P, 4, 4)
    rho2 = rhos @ rhos
    # trace of rho^2 (real for Hermitian rho)
    tr = rho2.re[:, jnp.arange(4), jnp.arange(4)].sum(axis=-1)
    return 1.0 - tr


def make_training_step(mesh: Mesh, n: int, padded_len: int,
                       rotoselect: bool = True):
    """One jitted ADAPT optimisation step over the mesh: a Rotoselect sweep
    on the tp-sharded statevector + dp-sharded pair scoring."""
    engine = sv_core.sweep_engine()
    bl = sweeps.default_block_len(padded_len)

    state_spec = NamedSharding(mesh, P("tp"))
    pair_spec = NamedSharding(mesh, P("dp", None))
    repl = NamedSharding(mesh, P())

    @jax.jit
    def step(prefix: C, kinds, q0, q1, angles, select, pairs):
        ref = sv_core.zero_state(n, prefix.dtype)
        nk, na, cost, l_state, evals = sweeps.sweep(
            engine, bl, rotoselect, prefix, ref, kinds, q0, q1, angles, select)
        scores = pair_purity_scores(l_state, pairs)
        return nk, na, cost, scores, evals

    def run(prefix: C, tape, select, pairs):
        prefix = C(jax.device_put(prefix.re, state_spec),
                   jax.device_put(prefix.im, state_spec))
        args = [jax.device_put(jnp.asarray(x), repl)
                for x in (tape.kinds, tape.q0, tape.q1, tape.angles)]
        select = jax.device_put(jnp.asarray(select), repl)
        # pad the pairs axis to a multiple of the dp extent
        pairs = np.asarray(pairs, dtype=np.int32)
        n_pairs = len(pairs)
        dp = mesh.shape["dp"]
        pad = (-n_pairs) % dp
        if pad:
            pairs = np.concatenate([pairs, np.tile(pairs[:1], (pad, 1))])
        pairs = jax.device_put(jnp.asarray(pairs), pair_spec)
        nk, na, cost, scores, evals = step(prefix, *args, select, pairs)
        return nk, na, cost, scores[:n_pairs], evals

    return run
