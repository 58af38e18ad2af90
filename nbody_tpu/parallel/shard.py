"""Multi-chip Barnes-Hut via shard_map over a 1-D device mesh.

The reference is strictly single-GPU (SURVEY.md §2.3): no NCCL/MPI, no
multi-device story of any kind.  This module is the new capability that
lets the same physics scale across a TPU slice (BASELINE config 5:
N=4M over v5e-8).

Decomposition (round 1):
  * particles are sharded along N ("bodies" mesh axis);
  * positions+masses are all-gathered over ICI; the cheap dense phases
    (bbox, Morton sort, group monopoles, near lists) run replicated —
    they are O(N) with small constants vs the force sweep's O(N * G);
  * each chip evaluates the far monopole sweep and near P2P corrections
    ONLY for its contiguous slab of target groups — exactly 1/D of the
    dominant dense work;
  * one all_gather re-assembles the accelerations; integration is
    shard-local.

The all-gathers ride ICI (4M particles x 16 B = 64 MB per step over
~100+ GB/s links).  A locality-aware variant (shard-local sort +
exchanged group tables only) is the planned round-2 upgrade; the API
here won't change.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from nbody_tpu.config import SimConfig
from nbody_tpu.state import ParticleState
from nbody_tpu.ops import bbox, morton, forces, integrate as integ

AXIS = "bodies"


def make_mesh(n_devices: Optional[int] = None) -> Mesh:
    import numpy as np

    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (AXIS,))


def _local_bh_step(pos, vel, mass, acc, cfg: SimConfig):
    """Body of the shard_map: args are the LOCAL shard [N/D, ...].

    Replicated cheap phases (bbox, Morton, sort, group monopoles, near
    lists — all O(N) dense ops), sharded expensive phase: chip `me`
    evaluates the far sweep and near corrections only for ITS contiguous
    slab of the sorted order (exactly 1/D of the dense work), then acc
    slabs are re-assembled with one all_gather.
    """
    pos_g = jax.lax.all_gather(pos, AXIS).reshape(-1, 3)
    mass_g = jax.lax.all_gather(mass, AXIS).reshape(-1)

    lo, size = bbox.bounding_cube(pos_g)
    codes = morton.encode30(pos_g, lo, size)
    codes_s, perm = morton.morton_sort_30(codes)
    pos_s = pos_g[perm]
    mass_s = mass_g[perm]

    d = jax.lax.axis_size(AXIS)
    me = jax.lax.axis_index(AXIS)
    n_total = pos_g.shape[0]
    n_local = n_total // d

    b = cfg.force_tile
    cells, supers, bands, _ = forces.build_bands(pos_s, mass_s, codes_s, cfg)

    # my slab of targets (contiguous blocks => contiguous particles)
    t_total = n_total // b
    t_local = t_total // d
    start_p = me * (t_local * b)
    my_pos = jax.lax.dynamic_slice_in_dim(pos_s, start_p, t_local * b, 0)

    def _slab(x):
        return jax.lax.dynamic_slice_in_dim(x, me * t_local, t_local, 0)

    my_bands = forces.CellBands(
        sup_idx=_slab(bands.sup_idx), sup_cnt=_slab(bands.sup_cnt),
        mid_idx=_slab(bands.mid_idx), mid_cnt=_slab(bands.mid_cnt),
        cmid_idx=_slab(bands.cmid_idx), cmid_cnt=_slab(bands.cmid_cnt),
        near_idx=_slab(bands.near_idx), near_cnt=_slab(bands.near_cnt),
        span_first=_slab(bands.span_first),
        span_count=_slab(bands.span_count),
        span_cnt=_slab(bands.span_cnt),
        sup_overflow=bands.sup_overflow,
        mid_overflow=bands.mid_overflow,
        cmid_overflow=bands.cmid_overflow,
        near_overflow=bands.near_overflow,
    )
    my_tab = forces.build_cell_tables(cells, supers, my_bands)
    acc_slab = forces.apply_bands(
        my_pos, None, supers, my_bands, my_tab, cfg,
        src_pos=pos_s, src_mass=mass_s,
    )

    # Re-assemble sorted acc and route back to original sharded order.
    acc_s = jax.lax.all_gather(acc_slab, AXIS).reshape(-1, 3)
    acc_orig = jnp.zeros_like(acc_s).at[perm].set(acc_s)
    my_acc = jax.lax.dynamic_slice_in_dim(acc_orig, me * n_local, n_local, 0)

    state_l = ParticleState(pos=pos, vel=vel, mass=mass, acc=acc)
    new = integ.integrate(state_l, my_acc, cfg)
    return new.pos, new.vel, new.mass, new.acc


def make_sharded_step(cfg: SimConfig, mesh: Mesh):
    """Jitted multi-chip step: ParticleState sharded along N -> same."""
    d = mesh.devices.size
    if cfg.n % (d * cfg.force_tile):
        raise ValueError(
            f"n={cfg.n} must be a multiple of n_devices*force_tile="
            f"{d * cfg.force_tile} for the sharded step"
        )

    fn = shard_map(
        functools.partial(_local_bh_step, cfg=cfg),
        mesh=mesh,
        in_specs=(P(AXIS), P(AXIS), P(AXIS), P(AXIS)),
        out_specs=(P(AXIS), P(AXIS), P(AXIS), P(AXIS)),
        check_vma=False,
    )

    @jax.jit
    def step(state: ParticleState) -> ParticleState:
        pos, vel, mass, acc = fn(state.pos, state.vel, state.mass, state.acc)
        return ParticleState(pos=pos, vel=vel, mass=mass, acc=acc)

    return step


def shard_state(state: ParticleState, mesh: Mesh) -> ParticleState:
    """Place a host state onto the mesh, sharded along N."""
    from jax.sharding import NamedSharding

    sh_n = NamedSharding(mesh, P(AXIS))
    return ParticleState(
        pos=jax.device_put(state.pos, sh_n),
        vel=jax.device_put(state.vel, sh_n),
        mass=jax.device_put(state.mass, sh_n),
        acc=jax.device_put(state.acc, sh_n),
    )
