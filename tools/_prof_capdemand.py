"""TRUE band-cap demand (maxima under huge caps) at the IC and at a
late-time state, with the production adaptive skins — sets the cap
defaults so the headline bench runs with overflow_bands=false.

Usage: _prof_capdemand.py [advance_steps] [N]
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import sys

import jax
import jax.numpy as jnp

from nbody_tpu.config import SimConfig
from nbody_tpu.models.simulation import Simulation, sort_by_morton, \
    adaptive_drift
from nbody_tpu.ops import forces
from nbody_tpu.utils.profiling import _sync

steps = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
n = int(sys.argv[2]) if len(sys.argv) > 2 else 1_000_000

cfg = SimConfig(n=n, theta=0.5, use_pallas=True, rebuild_every=16,
                hold_farmid=4, check_overflow=False)
# huge caps: maxima below are DEMAND, not clipped supply.  g2_cap_factor
# at the structural max matters most: an overflowed grandchild cap drops
# gchild_complete and FORCES those children into the near band, which
# masquerades as near demand (measured: the near tail at factor 3).
big = cfg.replace(sup_cap=2048, mid_cap=1024, cmid_cap=2048, near_cap=2048,
                  g2_cap_factor=8)
sim = Simulation(cfg)
st = jax.device_put(sim.init_state())
_sync(st)


def demand(label, skins=True):
    codes_s, perm, _, size = sort_by_morton(st.pos, cfg)
    ps, ms, cs = forces.pad_sorted(
        st.pos[perm], st.mass[perm], codes_s, cfg.force_tile
    )
    if skins:
        v = jnp.sqrt(jnp.sum(st.vel[perm] ** 2, axis=1))
        a = jnp.sqrt(jnp.sum(st.acc[perm] ** 2, axis=1))
        v = jnp.pad(v, (0, ps.shape[0] - v.shape[0]))
        a = jnp.pad(a, (0, ps.shape[0] - a.shape[0]))
        d = adaptive_drift(v, a, cs, size, big)
    else:
        d = jnp.zeros((ps.shape[0],), jnp.float32)

    @jax.jit
    def build(p, m, c, dd):
        cells, _, bands, _ = forces.build_bands(p, m, c, big, drift=dd)
        def q(x):
            xs = jnp.sort(x)
            return (jnp.mean(x.astype(jnp.float32)), xs[-1],
                    xs[int(0.999 * (x.shape[0] - 1))])
        return (q(bands.sup_cnt), q(bands.mid_cnt), q(bands.cmid_cnt),
                q(bands.near_cnt), q(bands.win_cnt),
                cells.overflow_g2, cells.n_cells, cells.n_child, cells.n_g2)
    out_all = build(ps, ms, cs, d)
    rows = out_all[:5]
    names = ["sup", "mid", "cmid", "near", "wins"]
    out = "  ".join(
        f"{nm} {float(r[0]):.0f}/p999 {int(r[2])}/max {int(r[1])}"
        for nm, r in zip(names, rows)
    )
    print(f"[{label}] {out}  g2over={bool(out_all[5])} "
          f"cells={int(out_all[6])} child={int(out_all[7])} g2={int(out_all[8])}",
          flush=True)


demand("IC skins", True)
demand("IC live ", False)
for i in range(steps // 128):
    st = sim.run_scan(st, 128)
    _sync(st)
    print(f"  advanced {(i + 1) * 128}", flush=True)
demand("hot skins", True)
demand("hot live ", False)
