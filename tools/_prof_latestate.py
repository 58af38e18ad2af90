"""Band/overflow diagnostics at a LATE-time state (dense contracted
core) under different reuse skins — tests the hypothesis that large-K
skins push the core past the band caps (overflow => coarse-monopole
fallback => theta violations => energy pumping).

Usage: _prof_latestate.py [advance_steps] [N]
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import sys

import jax
import jax.numpy as jnp

from nbody_tpu.config import SimConfig
from nbody_tpu.models.simulation import Simulation
from nbody_tpu.ops import bbox, morton, forces
from nbody_tpu.utils.profiling import _sync

steps = int(sys.argv[1]) if len(sys.argv) > 1 else 512
n = int(sys.argv[2]) if len(sys.argv) > 2 else 1_000_000

cfg = SimConfig(n=n, theta=0.5, use_pallas=True, rebuild_every=8,
                hold_farmid=4, check_overflow=False)
sim = Simulation(cfg)
st = sim.init_state()
st = jax.device_put(st)
_sync(st)
for i in range(steps // 128):
    st = sim.run_scan(st, 128)
    _sync(st)
    print(f"  advanced {(i+1)*128}", flush=True)

lo, size = bbox.bounding_cube(st.pos)
sc, perm = morton.morton_sort_30(morton.encode30(st.pos, lo, size))
ps, ms, cs = forces.pad_sorted(st.pos[perm], st.mass[perm], sc, cfg.force_tile)
vel_s = st.vel[perm]
v = jnp.sqrt(jnp.sum(vel_s * vel_s, axis=1))
v = jnp.pad(v, (0, ps.shape[0] - v.shape[0]))

for k in (1, 8, 16, 32):
    drift = jnp.minimum(v * cfg.dt * k * cfg.skin_safety,
                        cfg.max_speed * cfg.dt * k)
    if k == 1:
        drift = jnp.zeros_like(drift)
    cells, supers, bands, tables = jax.jit(
        lambda p, m, c, d: forces.build_bands(p, m, c, cfg, drift=d)
    )(ps, ms, cs, drift)
    _sync(bands.sup_cnt)
    mx = lambda x: int(jnp.max(x))
    mean = lambda x: float(jnp.mean(x))
    print(f"K={k:2d}: sup {mean(bands.sup_cnt):6.1f}/{mx(bands.sup_cnt):4d} "
          f"mid {mean(bands.mid_cnt):6.1f}/{mx(bands.mid_cnt):4d} "
          f"cmid {mean(bands.cmid_cnt):6.1f}/{mx(bands.cmid_cnt):4d} "
          f"near {mean(bands.near_cnt):6.1f}/{mx(bands.near_cnt):4d} "
          f"wins {mean(bands.win_cnt):6.1f}/{mx(bands.win_cnt):4d} "
          f"over: s={bool(bands.sup_overflow)} m={bool(bands.mid_overflow)} "
          f"c={bool(bands.cmid_overflow)} n={bool(bands.near_overflow)}",
          flush=True)
    # fraction of targets at the near cap (the graceful-degradation tail)
    t_at_cap = float(jnp.mean((bands.near_cnt >= cfg.near_cap).astype(jnp.float32)))
    s_at_cap = float(jnp.mean((bands.win_cnt >= bands.win_first.shape[1]).astype(jnp.float32)))
    print(f"      targets at near cap: {t_at_cap:.3%}  at window cap: {s_at_cap:.3%}",
          flush=True)
