"""Physics metrics and conservation diagnostics.

The reference's only "observability" is printf: final bounding box and
total kinetic energy (format strings in nbody_simple.exe / nbody_bh.exe,
SURVEY.md §5).  We provide those plus potential energy, momentum, and the
energy-drift metric BASELINE.json names as the physics north star.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
from jax import lax

from nbody_tpu.config import SimConfig
from nbody_tpu.state import ParticleState
from nbody_tpu.ops.forces import soft_term


def kinetic_energy(state: ParticleState) -> jax.Array:
    """KE = 1/2 sum m |v|^2 — the legacy binaries print this as
    'Total kinetic energy: %.2e'."""
    return 0.5 * jnp.sum(state.mass * jnp.sum(state.vel**2, axis=1))


def potential_energy(state: ParticleState, cfg: SimConfig, block: int = 1024) -> jax.Array:
    """PE = -G sum_{i<j} m_i m_j / sqrt(|r_ij|^2 + soft), consistent with
    the softened force law.  O(N^2), blocked; intended for diagnostics at
    moderate N or on subsamples."""
    pos, mass = state.pos, state.mass
    n = pos.shape[0]
    g, soft = cfg.g, soft_term(cfg)
    n_pad = -(-n // block) * block
    pos_p = jnp.pad(pos, ((0, n_pad - n), (0, 0)))
    mass_p = jnp.pad(mass, (0, n_pad - n))

    def panel(args):
        pb, mb = args  # [B,3], [B]
        dx = pos[None, :, 0] - pb[:, None, 0]
        dy = pos[None, :, 1] - pb[:, None, 1]
        dz = pos[None, :, 2] - pb[:, None, 2]
        d2 = dx * dx + dy * dy + dz * dz
        inv = lax.rsqrt(d2 + soft)
        # self-pairs have d2=0 -> 1/sqrt(soft); subtract them afterwards
        return jnp.sum(mb[:, None] * mass[None, :] * inv)

    total = jnp.sum(
        lax.map(panel, (pos_p.reshape(-1, block, 3), mass_p.reshape(-1, block)))
    )
    self_term = jnp.sum(mass * mass) * lax.rsqrt(jnp.asarray(soft, jnp.float32))
    return -0.5 * g * (total - self_term)


def momentum(state: ParticleState) -> jax.Array:
    return jnp.sum(state.mass[:, None] * state.vel, axis=0)


def bounding_box(state: ParticleState):
    return jnp.min(state.pos, axis=0), jnp.max(state.pos, axis=0)


def total_energy(state: ParticleState, cfg: SimConfig) -> jax.Array:
    return kinetic_energy(state) + potential_energy(state, cfg)


def energy_drift(e0: float, e1: float) -> float:
    """Relative drift |E1 - E0| / |E0| — the BASELINE.json criterion."""
    return abs(e1 - e0) / max(abs(e0), 1e-30)


def drift_protocol(sim, state: ParticleState, n_steps: int = 1024,
                   chunk: int = 32, log=None) -> Dict:
    """THE canonical kilostep physics measurement (BASELINE.json
    criterion; the reference workload is 1000 EVOLVING frames,
    nbody_v5_bench.cu:353-366).

    Measures E0 = KE + softened PE at entry, advances EXACTLY
    ceil(n_steps/chunk)*chunk steps in `chunk`-sized Simulation.run_scan
    calls (ONE compiled scan shape — no protocol-dependent chunking),
    measures E1, and times both the whole evolution and the final chunk.
    Shared by bench.py and tools/_prof_kilostep.py so the driver artifact
    and the gate tool can never measure different protocols again
    (round-4 verdict: an 896-step tool run and a 1024-step driver run
    reported 0.094% vs 0.72% for "the same" config).

    `log(steps_done, seconds, state)` is called after each chunk when
    given (host sync per chunk either way — run_scan chunks already sync).

    Returns {drift, drift_steps, e0, e1, avg_steps_per_sec,
    hot_steps_per_sec, seconds, state}.
    """
    import time

    from nbody_tpu.utils.profiling import _sync

    reps = -(-n_steps // chunk)
    total = reps * chunk
    e0 = float(total_energy(state, sim.cfg))
    _sync(state)
    t_log = 0.0        # callback overhead, excluded from the rates
    t_all0 = time.perf_counter()
    t_hot0 = t_all0
    t_log_at_hot = 0.0
    for i in range(reps):
        if i == reps - 1:
            _sync(state)
            t_hot0 = time.perf_counter()
            t_log_at_hot = t_log
        state = sim.run_scan(state, chunk)
        if log is not None:
            _sync(state)
            tl0 = time.perf_counter()
            log(chunk * (i + 1), tl0 - t_all0 - t_log, state)
            t_log += time.perf_counter() - tl0
    _sync(state)
    t_end = time.perf_counter()
    e1 = float(total_energy(state, sim.cfg))
    return {
        "drift": energy_drift(e0, e1),
        "drift_steps": total,
        "e0": e0,
        "e1": e1,
        "avg_steps_per_sec": total / (t_end - t_all0 - t_log),
        "hot_steps_per_sec": chunk / (t_end - t_hot0 - (t_log - t_log_at_hot)),
        "seconds": t_end - t_all0 - t_log,
        "state": state,
    }


def cell_count(state: ParticleState, cfg: SimConfig) -> jax.Array:
    """Adaptive source-cell count — the cheap jittable analog of the
    legacy binaries' per-step "Nodes: %d" telemetry (strings in
    nbody.exe / nbody_bh.exe, SURVEY.md §3.3)."""
    from nbody_tpu.ops import forces as _forces
    from nbody_tpu.ops.cells import build_source_cells
    from nbody_tpu.models.simulation import sort_by_morton

    cs, perm, lo, size = sort_by_morton(state.pos, cfg)
    ps, ms, csp = _forces.pad_sorted(
        state.pos[perm], state.mass[perm], cs, cfg.force_tile
    )
    cells = build_source_cells(
        csp, ps, ms, cfg.force_tile, cfg.g, cfg.cell_capacity, lo, size
    )
    return cells.n_cells


def bh_diagnostics(state: ParticleState, cfg: SimConfig) -> Dict[str, float]:
    """Structure telemetry — the TPU analog of the legacy binaries'
    per-step "Nodes: %d" print (strings in nbody.exe / nbody_bh.exe):
    adaptive cell count, band-list statistics, and overflow flags."""
    import jax.numpy as jnp

    from nbody_tpu.ops import forces as _forces
    from nbody_tpu.models.simulation import sort_by_morton

    cs, perm, lo, size = sort_by_morton(state.pos, cfg)
    ps, ms, csp = _forces.pad_sorted(state.pos[perm], state.mass[perm], cs, cfg.force_tile)
    cells, far, bands, _ = _forces.build_bands(ps, ms, csp, cfg)
    return {
        "n_cells": int(cells.n_cells),
        "n_supersupers": int(far.n_supers),
        "cell_capacity": int(cfg.cell_capacity),
        "cell_overflow": bool(cells.overflow),
        "g2_overflow": bool(cells.overflow_g2),
        "ss_mean": float(jnp.mean(bands.ss_cnt)),
        "sup_mean": float(jnp.mean(bands.sup_cnt)),
        "mid_mean": float(jnp.mean(bands.mid_cnt)),
        "cmid_mean": float(jnp.mean(bands.cmid_cnt)),
        "near_mean": float(jnp.mean(bands.near_cnt)),
        "win_mean": float(jnp.mean(bands.win_cnt)),
        "ss_overflow": bool(bands.ss_overflow),
        "sup_overflow": bool(bands.sup_overflow),
        "mid_overflow": bool(bands.mid_overflow),
        "cmid_overflow": bool(bands.cmid_overflow),
        "near_overflow": bool(bands.near_overflow),
    }


def summary(state: ParticleState, cfg: SimConfig, with_pe: bool = True) -> Dict[str, float]:
    lo, hi = bounding_box(state)
    p = momentum(state)
    out = {
        "ke": float(kinetic_energy(state)),
        "px": float(p[0]),
        "py": float(p[1]),
        "pz": float(p[2]),
        "bbox_min": [float(x) for x in lo],
        "bbox_max": [float(x) for x in hi],
    }
    if with_pe:
        out["pe"] = float(potential_energy(state, cfg))
        out["e_total"] = out["ke"] + out["pe"]
    return out
