"""Anatomy of the band-demand TAIL targets: are the worst targets
Morton-seam blocks (fat sub-spheres from runs straddling octant
boundaries) or genuinely busy dense-core targets?

Usage: _prof_tailtargets.py [N]
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import sys
import jax, jax.numpy as jnp, numpy as np
from nbody_tpu.config import SimConfig
from nbody_tpu.models.simulation import Simulation, sort_by_morton
from nbody_tpu.ops import forces
from nbody_tpu.utils.profiling import _sync

n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
cfg = SimConfig(n=n, theta=0.5, use_pallas=True, check_overflow=False)
big = cfg.replace(sup_cap=2048, mid_cap=1024, cmid_cap=2048, near_cap=2048,
                  g2_cap_factor=8)
sim = Simulation(cfg)
st = jax.device_put(sim.init_state()); _sync(st)
codes_s, perm, _, size = sort_by_morton(st.pos, cfg)
ps, ms, cs = forces.pad_sorted(st.pos[perm], st.mass[perm], codes_s, cfg.force_tile)

@jax.jit
def build(p, m, c):
    _, _, bands, _ = forces.build_bands(p, m, c, big)
    subs = forces.target_subspheres(p, big.force_tile, codes=c)
    rad = subs.radius.reshape(-1, forces.SUB_FACTOR)
    return bands.sup_cnt, bands.mid_cnt, bands.near_cnt, bands.win_cnt, rad

sup, mid, near, wins, rad = build(ps, ms, cs)
_sync(sup)
sup, mid, near, wins, rad = map(np.asarray, (sup, mid, near, wins, rad))
order = np.argsort(-near)
print(f"box size {float(size):.0f}; percentiles of max sub-radius: "
      f"p50 {np.percentile(rad.max(1), 50):.1f} p99 "
      f"{np.percentile(rad.max(1), 99):.1f} max {rad.max():.1f}", flush=True)
for lab, arr in (("near", near), ("sup", sup), ("mid", mid)):
    o = np.argsort(-arr)[:8]
    print(f"top {lab}:", flush=True)
    for t in o:
        print(f"  t={t} sup={sup[t]} mid={mid[t]} near={near[t]} wins={wins[t]} "
              f"subrad={np.sort(rad[t])[::-1][:4].round(1)}", flush=True)
# correlation: how much of the tail is fat-sphere (seam) targets?
fat = rad.max(1) > float(size) / 16
print(f"targets with a sub-sphere radius > box/16: {fat.sum()} "
      f"({fat.mean():.3%}); their near p50/max: "
      f"{np.percentile(near[fat], 50) if fat.any() else 0:.0f}/"
      f"{near[fat].max() if fat.any() else 0}", flush=True)
print(f"non-fat targets near p999/max: "
      f"{np.percentile(near[~fat], 99.9):.0f}/{near[~fat].max()}", flush=True)
