"""Ensemble (data-parallel) simulation runs.

The reference is strictly one simulation per process (SURVEY.md §2.3 —
no data parallelism of any kind).  Two new capabilities here:

* `vmap_steps`  — a batched step advancing E independent simulations in
  one jitted call on one chip (vmapped pipeline; great for parameter
  sweeps of small systems).
* `sharded_ensemble_step` — the same, with ensemble members spread
  across the devices of a mesh (classic data parallelism: no cross-chip
  communication at all).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from nbody_tpu.config import SimConfig
from nbody_tpu.state import ParticleState
from nbody_tpu.models.simulation import step_barnes_hut, step_direct


def stack_states(states) -> ParticleState:
    """[E] list of ParticleState(n) -> ParticleState with [E, ...] leaves."""
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *states)


def make_ensemble_step(cfg: SimConfig, method: str = "barnes_hut"):
    """Jitted step over a batched ParticleState ([E, N, 3] / [E, N])."""
    if method == "direct":
        fn = functools.partial(step_direct, cfg=cfg)
    elif method == "barnes_hut":
        fn = functools.partial(step_barnes_hut, cfg=cfg, force_fn="tiled")
    else:
        raise ValueError(method)
    return jax.jit(jax.vmap(fn))


def shard_ensemble(batched: ParticleState, mesh: Mesh, axis: str) -> ParticleState:
    """Place a batched state with the ensemble dim sharded over `axis`."""
    def put(x):
        spec = P(axis, *([None] * (x.ndim - 1)))
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map(put, batched)


def make_sharded_ensemble_step(cfg: SimConfig, mesh: Mesh, axis: str = "ensemble",
                               method: str = "barnes_hut"):
    """Data-parallel ensemble: members sharded over the mesh, zero
    collectives — each chip integrates its own simulations."""
    step = make_ensemble_step(cfg, method)

    @jax.jit
    def run(batched: ParticleState) -> ParticleState:
        return step(batched)

    return run
