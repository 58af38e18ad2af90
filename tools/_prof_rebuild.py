"""Rebuild-phase breakdown at the IC and a late (hot) state: sort, perm
gathers, cells, supers+subspheres, classification, tables — the terms of
the per-rebuild cost the adaptive runner pays every 1-2 steps at the 1M
hot state (value_hot is rebuild-bound: 327 ms/step hot vs 88 near-IC).

Usage: _prof_rebuild.py [n] [advance_steps]
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import sys, time

import jax, jax.numpy as jnp

from nbody_tpu.config import SimConfig
from nbody_tpu.models.simulation import (
    Simulation, sort_by_morton, adaptive_drift,
)
from nbody_tpu.ops import forces
from nbody_tpu.ops.cells import build_source_cells
from nbody_tpu.ops import bbox as _bbox
from nbody_tpu.utils.profiling import _sync, time_fn

n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
adv = int(sys.argv[2]) if len(sys.argv) > 2 else 0
over = {}
for kv in sys.argv[3:]:
    k_, v_ = kv.split("=")
    f_ = SimConfig.__dataclass_fields__[k_].type
    over[k_] = (v_.lower() in ("1", "true")) if "bool" in str(f_) else (
        float(v_) if "float" in str(f_) else int(v_))

cfg = SimConfig(n=n, rebuild_every=16, hold_farmid=4, check_overflow=False,
                **over)
sim = Simulation(cfg)
hot = _os.environ.get("NBODY_HOT_STATE")
if hot:
    from nbody_tpu.utils.io import load_checkpoint
    st, at = load_checkpoint(hot)
    st = jax.device_put(st)
    _sync(st)
    print(f"  loaded {hot} (step {at})", flush=True)
else:
    st = jax.device_put(sim.init_state())
    _sync(st)
if adv and not hot:
    done = 0
    while done < adv:
        k = min(256, adv - done)
        st = sim.run_scan(st, k)
        done += k
        _sync(st)
        print(f"  advanced {done}", flush=True)

# relay overhead: a trivial dispatch
noop = jax.jit(lambda x: x + 1.0)
base = time_fn(noop, jnp.zeros((8,), jnp.float32), iters=10)["median_ms"]
print(f"[relay] {base:.1f} ms dispatch overhead (subtracted below)", flush=True)


def report(label, fn, *args, iters=8):
    t = time_fn(jax.jit(fn), *args, iters=iters)["median_ms"]
    print(f"  {label:18s} {t - base:7.1f} ms", flush=True)
    return jax.jit(fn)(*args)


pos, vel, mass, acc = st.pos, st.vel, st.mass, st.acc
print(f"[rebuild phases] n={n} after {adv} steps", flush=True)

codes_s, perm, lo, size = report(
    "sort", lambda p: sort_by_morton(p, cfg), pos
)

def permute(pos, vel, mass, acc, perm):
    return pos[perm], vel[perm], mass[perm], acc[perm]

pos_s, vel_s, mass_s, acc_s = report(
    "perm gathers", permute, pos, vel, mass, acc, perm
)

ps, ms, cs = forces.pad_sorted(pos_s, mass_s, codes_s, cfg.force_tile)
v = jnp.pad(jnp.sqrt(jnp.sum(vel_s**2, axis=1)), (0, ps.shape[0] - n))
a = jnp.pad(jnp.sqrt(jnp.sum(acc_s**2, axis=1)), (0, ps.shape[0] - n))
drift = jax.jit(lambda v, a, c: adaptive_drift(v, a, c, size, cfg, k=4.0))(v, a, cs)
_sync(drift)

cells = report(
    "cells", lambda c, p, m, d: build_source_cells(
        c, p, m, cfg.force_tile, cfg.g, cfg.cell_capacity, lo, size,
        drift_sorted=d, g2_factor=cfg.g2_cap_factor),
    cs, ps, ms, drift,
)
supers = report("supers", forces.make_supers, cells)
ss = report("supersupers", forces.make_supersupers, supers)
tgt = report(
    "subspheres", lambda p, d, c: forces.target_subspheres(
        p, cfg.force_tile, drift=d, codes=c), ps, drift, cs
)
bands = report(
    "classify", lambda t, s2, s, c: forces.cell_band_lists(t, s2, s, c, cfg),
    tgt, ss, supers, cells,
)
tables = report(
    "tables", lambda c, s, s2, b: forces.build_cell_tables(c, s, s2, b),
    cells, supers, ss, bands,
)
full = report(
    "FULL build_bands", lambda p, m, c, d: forces.build_bands(
        p, m, c, cfg, drift=d), ps, ms, cs, drift,
)
print(f"  bands: ss={float(jnp.mean(bands.ss_cnt)):.1f} "
      f"sup={float(jnp.mean(bands.sup_cnt)):.1f} "
      f"mid={float(jnp.mean(bands.mid_cnt)):.1f} "
      f"cmid={float(jnp.mean(bands.cmid_cnt)):.1f} "
      f"near={float(jnp.mean(bands.near_cnt)):.1f} "
      f"wins={float(jnp.mean(bands.win_cnt)):.1f}", flush=True)
