"""Direct force-error measurement of band reuse at a LATE-time state.

Advances the 1M galaxy 512 steps (dense contracted core), then measures
the relative acceleration error of
  (a) production reuse: structures frozen at S0, live targets/near;
  (b) refresh variant: same frozen cut/classification, but monopoles
      recomputed from live positions at the frozen boundaries
      (build_source_cells with frozen codes + live positions);
vs a fresh per-step rebuild, after j in {2, 4, 8, 16} steps of drift.
Splits the error by core (smallest local width) vs the rest.

Usage: _prof_stale.py [advance] [N]
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from nbody_tpu.config import SimConfig
from nbody_tpu.models.simulation import Simulation
from nbody_tpu.ops import bbox, morton, forces
from nbody_tpu.ops.cells import build_source_cells
from nbody_tpu.utils.profiling import _sync

advance = int(sys.argv[1]) if len(sys.argv) > 1 else 512
n = int(sys.argv[2]) if len(sys.argv) > 2 else 1_000_000
K = 16

cfg = SimConfig(n=n, theta=0.5, use_pallas=True, rebuild_every=8,
                hold_farmid=1, adaptive_rebuild=False, check_overflow=False)
sim = Simulation(cfg)
cache = f"/tmp/stale_state_{n}_{advance}.npz"
if _os.path.exists(cache):
    z = np.load(cache)
    from nbody_tpu.state import ParticleState
    st = ParticleState(pos=jnp.asarray(z["pos"]), vel=jnp.asarray(z["vel"]),
                       mass=jnp.asarray(z["mass"]), acc=jnp.asarray(z["acc"]))
    st = jax.device_put(st); _sync(st)
    print(f"  loaded cached state {cache}", flush=True)
else:
    st = sim.init_state()
    st = jax.device_put(st); _sync(st)
    t0 = time.perf_counter()
    for i in range(advance // 128):
        st = sim.run_scan(st, 128)
        _sync(st)
        print(f"  advanced {(i+1)*128} ({time.perf_counter()-t0:.0f}s)", flush=True)
    np.savez(cache, pos=np.asarray(st.pos), vel=np.asarray(st.vel),
             mass=np.asarray(st.mass), acc=np.asarray(st.acc))

# ---- S0: frozen structures with K-step drift bounds ----
lo, size = bbox.bounding_cube(st.pos)
codes = morton.encode30(st.pos, lo, size)
codes_s, perm = morton.morton_sort_30(codes)
pos0 = st.pos[perm]; vel0 = st.vel[perm]; mass_s = st.mass[perm]
ps0, ms, cs = forces.pad_sorted(pos0, mass_s, codes_s, cfg.force_tile)
npad = ps0.shape[0]
vel_p = jnp.concatenate([vel0, jnp.broadcast_to(vel0[-1], (npad - n, 3))])
v = jnp.sqrt(jnp.sum(vel_p**2, axis=1))
drift = jnp.minimum(v * cfg.dt * K * cfg.skin_safety,
                    cfg.max_speed * cfg.dt * K)

build = jax.jit(lambda p, m, c, d: forces.build_bands(p, m, c, cfg, drift=d))
cells0, supers0, bands0, tables0 = build(ps0, ms, cs, drift)
_sync(bands0.sup_cnt)

w_loc = np.asarray(forces.local_width(cs, size, cfg.force_tile))
w_loc = w_loc[:n]
core = w_loc < np.percentile(w_loc, 10)   # the tightest 10%
print(f"core w_loc median {np.median(w_loc[core]):.1f} vs all {np.median(w_loc):.1f}",
      flush=True)

# ---- ground-truth evolution with per-step rebuild, tracked in S0 ORDER --
step1 = jax.jit(lambda s: sim._step(s))

apply_frozen = jax.jit(lambda p, m, su, bd, tb: forces.apply_bands(
    p, m, su, bd, tb, cfg))


@jax.jit
def apply_refresh(p_live, m, c, d, bd):
    cells_r = build_source_cells(
        c, p_live, m, cfg.force_tile, cfg.g, cfg.cell_capacity, lo, size,
        drift_sorted=d)
    supers_r = forces.make_supers(cells_r)
    ss_r = forces.make_supersupers(supers_r)
    tables_r = forces.build_cell_tables(cells_r, supers_r, ss_r, bd)
    return forces.apply_bands(p_live, m, ss_r, bd, tables_r, cfg)

def fresh_acc_fn(p_orig, m_orig):
    from nbody_tpu.models.simulation import compute_bh_acc
    return compute_bh_acc(p_orig, m_orig, cfg)

fresh = jax.jit(fresh_acc_fn)

inv_perm = jnp.argsort(perm)

state_j = st
done = 0
for j in (2, 4, 8, 16):
    while done < j:
        state_j = step1(state_j)
        done += 1
    _sync(state_j)
    # live positions in the FROZEN order (production: no re-sort in-cycle)
    p_live_sorted = state_j.pos[perm]
    p_live = jnp.concatenate(
        [p_live_sorted, jnp.broadcast_to(p_live_sorted[-1], (npad - n, 3))])
    a_frozen = np.asarray(apply_frozen(p_live, ms, supers0, bands0, tables0))[:n]
    a_refresh = np.asarray(apply_refresh(p_live, ms, cs, drift, bands0))[:n]
    a_true_orig = np.asarray(fresh(state_j.pos, state_j.mass))
    a_true = a_true_orig[np.asarray(perm)]

    def rep(a, label):
        num = np.linalg.norm(a - a_true, axis=1)
        den = np.linalg.norm(a_true, axis=1) + 1e-6
        rel = num / den
        print(f"  j={j:2d} {label:8s} rel err: med {np.median(rel):.2e} "
              f"p95 {np.percentile(rel, 95):.2e} max {rel.max():.2e} | "
              f"core med {np.median(rel[core]):.2e} "
              f"p95 {np.percentile(rel[core], 95):.2e}", flush=True)

    rep(a_frozen, "frozen")
    rep(a_refresh, "refresh")
