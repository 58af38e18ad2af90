"""Multi-chip Barnes-Hut via shard_map over a 1-D device mesh.

The reference is strictly single-GPU (SURVEY.md §2.3): no NCCL/MPI, no
multi-device story of any kind.  This module is the new capability that
lets the same physics scale across a TPU slice (BASELINE config 5:
N=4M over v5e-8).

Decomposition (the "config-5" design, SURVEY.md §2.3 row SP/CP):

  * particles live in Morton-SORTED SLABS: chip d owns the contiguous
    range [d*N/D, (d+1)*N/D) of the global sorted order, so each chip's
    targets are spatially compact;
  * per REBUILD (once per band-reuse cycle): codes are computed locally
    and the full sorted state is re-slabbed via one all_gather (16-28 B
    per particle, amortized over the K steps of the cycle); the adaptive
    source cells and super monopoles are built replicated (O(N) scans
    with small constants — a sharded-scan build is a further upgrade);
  * CLASSIFICATION (band lists + tables — the dominant build cost) runs
    ONLY for the chip's own T/D target blocks: per-chip band shapes are
    statically T/D (asserted at trace time below);
  * per STEP, the only communication is one all_gather of LIVE positions
    (12 B/particle over ICI — ~0.5 ms at 4M on a v5e-8) so the exact
    near-band P2P sees current sources; the far/mid sweeps read the
    frozen replicated monopoles (KBs) and the chip's own tables;
  * integration is slab-local.

Per-chip per-step compute is therefore ~1/D of the sweep work; the
replicated residue is the per-cycle sort + cell build only.
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


def _gather(x):
    g = jax.lax.all_gather(x, AXIS)
    return g.reshape((-1,) + g.shape[2:])


def _sort_global(pos_g, cfg: SimConfig):
    """Replicated global Morton sort (codes are 4 B/particle; every chip
    computes the same permutation)."""
    lo, size = bbox.bounding_cube(pos_g)
    codes = morton.encode30(pos_g, lo, size)
    return morton.morton_sort_30(codes)


def _classify_slab(pos_s, mass_s, codes_s, cfg: SimConfig, drift=None):
    """Replicated cells/supers + MY SLAB's classification.

    pos_s/mass_s/codes_s/drift are the GLOBAL sorted (padded) arrays;
    returns (cells, supers, bands_slab, tables_slab, my_pos, my_drift).
    Per-chip classification work is statically T/D — asserted below.
    """
    from nbody_tpu.ops.cells import build_source_cells

    d = jax.lax.axis_size(AXIS)
    me = jax.lax.axis_index(AXIS)
    n_pad = pos_s.shape[0]
    m = n_pad // d                        # slab particles
    b = cfg.force_tile

    box_lo, box_size = bbox.bounding_cube(pos_s)
    cells = build_source_cells(
        codes_s, pos_s, mass_s, b, cfg.g, cfg.cell_capacity,
        box_lo, box_size, drift_sorted=drift,
    )
    supers = forces.make_supers(cells)

    start = me * m
    my_pos = jax.lax.dynamic_slice_in_dim(pos_s, start, m, 0)
    my_drift = (
        None if drift is None
        else jax.lax.dynamic_slice_in_dim(drift, start, m, 0)
    )
    tgt_subs = forces.target_subspheres(my_pos, b, drift=my_drift)
    bands = forces.cell_band_lists(tgt_subs, supers, cells, cfg)
    tables = forces.build_cell_tables(cells, supers, bands)
    # config-5 invariant: classification output is the LOCAL slab only
    assert bands.sup_idx.shape[0] == m // b, (
        "per-chip classification must cover exactly T/D target blocks"
    )
    assert tables.tx.shape[0] == m // b
    return cells, supers, bands, tables, my_pos


def _local_bh_step(pos, vel, mass, acc, cfg: SimConfig):
    """shard_map body for the single-step path: args are LOCAL slabs of
    the ORIGINAL particle order [N/D, ...].

    Sort + cells are replicated (cheap O(N) scans); classification,
    tables, all three sweeps, and integration cover only this chip's
    slab of the sorted order.
    """
    pos_g = _gather(pos)
    mass_g = _gather(mass)

    codes_s, perm = _sort_global(pos_g, cfg)
    pos_s = pos_g[perm]
    mass_s = mass_g[perm]
    ps, ms, cs = forces.pad_sorted(pos_s, mass_s, codes_s, cfg.force_tile)

    d = jax.lax.axis_size(AXIS)
    me = jax.lax.axis_index(AXIS)
    n_total = pos_g.shape[0]
    n_local = n_total // d

    cells, supers, bands, tables, my_pos = _classify_slab(ps, ms, cs, cfg)
    acc_slab = forces.apply_bands(
        my_pos, None, supers, bands, tables, cfg,
        src_pos=ps, src_mass=ms,
    )

    # Re-assemble sorted acc and route back to original sharded order.
    acc_s = _gather(acc_slab)[: n_total]
    acc_orig = jnp.zeros_like(acc_s).at[perm].set(acc_s)
    my_acc = jax.lax.dynamic_slice_in_dim(acc_orig, me * n_local, n_local, 0)

    state_l = ParticleState(pos=pos, vel=vel, mass=mass, acc=acc)
    new = integ.integrate(state_l, my_acc, cfg)
    return new.pos, new.vel, new.mass, new.acc


def make_sharded_step(cfg: SimConfig, mesh: Mesh):
    """Jitted multi-chip step: ParticleState sharded along N -> same.
    Requires n % (n_devices * force_tile) == 0 (use make_sharded_runner
    for arbitrary n — it pads)."""
    d = mesh.devices.size
    if cfg.n % (d * cfg.force_tile):
        raise ValueError(
            f"n={cfg.n} must be a multiple of n_devices*force_tile="
            f"{d * cfg.force_tile} for the sharded step; "
            "make_sharded_runner handles arbitrary n by padding"
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


# ---------------------------------------------------------------------------
# Sharded band-reuse cycles (the production multi-chip path)
# ---------------------------------------------------------------------------


def _sharded_cycles_body(pos, vel, mass, acc, orig, cfg: SimConfig,
                         n_cycles: int, k: int):
    """shard_map body advancing local slabs by n_cycles * k steps.

    Slabs are in the GLOBAL SORTED ORDER of the latest rebuild; `orig`
    maps slab rows to original particle ids (pad rows -> n).  Each cycle:
    one full-state all_gather + replicated sort/cells + slab-local
    classification, then k steps whose only communication is the live
    position all_gather for the near band.
    """
    d = jax.lax.axis_size(AXIS)
    me = jax.lax.axis_index(AXIS)
    m = pos.shape[0]
    b = cfg.force_tile

    def cycle(carry, _):
        pos, vel, mass, acc, orig = carry
        # ---- rebuild: re-slab the full sorted state (1/cycle) ----
        pos_g = _gather(pos)
        vel_g = _gather(vel)
        mass_g = _gather(mass)
        acc_g = _gather(acc)
        orig_g = _gather(orig)
        codes_s, perm = _sort_global(pos_g, cfg)
        pos_s, vel_s = pos_g[perm], vel_g[perm]
        mass_s, acc_s, orig_s = mass_g[perm], acc_g[perm], orig_g[perm]

        v = jnp.sqrt(jnp.sum(vel_s * vel_s, axis=1))
        a = jnp.sqrt(jnp.sum(acc_s * acc_s, axis=1))
        drift = (
            v * cfg.dt * k + 0.5 * a * cfg.dt * cfg.dt * k * (k + 1)
        ) * cfg.skin_safety
        if cfg.clamp_speed:
            drift = jnp.minimum(drift, cfg.max_speed * cfg.dt * k)

        cells, supers, bands, tables, my_pos = _classify_slab(
            pos_s, mass_s, codes_s, cfg, drift=drift
        )
        start = me * m
        my_vel = jax.lax.dynamic_slice_in_dim(vel_s, start, m, 0)
        my_acc = jax.lax.dynamic_slice_in_dim(acc_s, start, m, 0)
        my_mass = jax.lax.dynamic_slice_in_dim(mass_s, start, m, 0)
        my_orig = jax.lax.dynamic_slice_in_dim(orig_s, start, m, 0)

        # ---- k steps: only LIVE POSITIONS cross chips (near band) ----
        # with cfg.hold_farmid = R > 1, the smooth slab-local far+mid
        # component is additionally held for R steps (r-RESPA split,
        # models/simulation.py) — it involves no communication either way
        r = max(1, cfg.hold_farmid)
        if k % r:
            r = 1

        def one_step(p, v_, afm):
            p_live = _gather(p)           # [N, 3] live sources over ICI
            a_ = afm + forces.apply_near(
                p, p_live, mass_s, bands, cfg
            )
            st = integ.integrate(
                ParticleState(pos=p, vel=v_, mass=my_mass, acc=a_), a_, cfg
            )
            return st.pos, st.vel, a_

        def subcycle(c2, _):
            p0, v0, a0 = c2
            # midpoint evaluation (see models/simulation.py): second-order
            # hold; stays inside the skin-covered drift envelope
            p_mid = p0 + v0 * (0.5 * (r - 1) * cfg.dt)
            afm = forces.apply_farmid(p_mid, supers, tables, cfg)

            def inner(c3, _):
                p, v_, _ = c3
                return one_step(p, v_, afm), None

            return jax.lax.scan(inner, (p0, v0, a0), None, length=r)

        (my_pos2, my_vel2, my_acc2), _ = jax.lax.scan(
            subcycle, (my_pos, my_vel, my_acc), None, length=k // r
        )
        return (my_pos2, my_vel2, my_mass, my_acc2, my_orig), None

    carry = (pos, vel, mass, acc, orig)
    carry, _ = jax.lax.scan(cycle, carry, None, length=n_cycles)
    return carry


def make_sharded_runner(cfg: SimConfig, mesh: Mesh, n_cycles: int, k: int):
    """Jitted multi-chip band-reuse runner: advances a state (sharded
    along N in ORIGINAL order) by n_cycles * k steps and returns it in
    original order.  Pads n to a multiple of D * force_tile with
    massless clones, so any n works."""
    d = mesh.devices.size
    b = cfg.force_tile
    n = cfg.n
    n_pad = -(-n // (d * b)) * (d * b)

    body = shard_map(
        functools.partial(
            _sharded_cycles_body, cfg=cfg, n_cycles=n_cycles, k=k
        ),
        mesh=mesh,
        in_specs=(P(AXIS),) * 5,
        out_specs=(P(AXIS),) * 5,
        check_vma=False,
    )

    @jax.jit
    def run(state: ParticleState) -> ParticleState:
        pad = n_pad - n
        orig = jnp.concatenate(
            [jnp.arange(n, dtype=jnp.int32), jnp.full((pad,), n, jnp.int32)]
        )
        pos = jnp.concatenate(
            [state.pos, jnp.broadcast_to(state.pos[-1], (pad, 3))]
        )
        vel = jnp.concatenate(
            [state.vel, jnp.broadcast_to(state.vel[-1], (pad, 3))]
        )
        mass = jnp.concatenate([state.mass, jnp.zeros((pad,), state.mass.dtype)])
        acc = jnp.concatenate([state.acc, jnp.zeros((pad, 3), state.acc.dtype)])
        pos, vel, mass, acc, orig = body(pos, vel, mass, acc, orig)
        # scatter back to original order (pad rows' orig == n: dropped)
        return ParticleState(
            pos=jnp.zeros((n, 3), pos.dtype).at[orig].set(pos),
            vel=jnp.zeros((n, 3), vel.dtype).at[orig].set(vel),
            mass=state.mass,
            acc=jnp.zeros((n, 3), acc.dtype).at[orig].set(acc),
        )

    return run


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
