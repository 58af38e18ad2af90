"""Hot-state skin-width-cap (alpha) experiment — the round-4 value_hot
lever.  Loads the 1024-step 1M checkpoint (tools/_prof_mkhot.py) and for
each alpha:
  1. band-cap DEMAND under huge caps with the adaptive skins (k_env=16),
     plus the validity horizon those skins buy;
  2. sustained hot rate: the production adaptive runner with that alpha
     and demand-sized caps, timed over a 64-step scan (second call).

Prior (round 3): alpha=1.5 failed the kilostep gate at 0.52 pct because
the hot-core skins FLOODED the then-default caps (graceful coarse-
monopole overflow = standing theta violation = heating).  The hypothesis
here: alpha up + caps sized to the widened demand keeps every MAC
conservative (no overflow), so physics holds while the horizon (and the
rebuild amortization) grows.  Gate any winner with _prof_kilostep.py.

Usage: _prof_hotcfg.py [alphas, e.g. 0.75,1.5,2.5] [hot.npz]
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import sys, time

import jax, jax.numpy as jnp

from nbody_tpu.config import SimConfig
from nbody_tpu.models.simulation import (
    Simulation, sort_by_morton, adaptive_drift, validity_horizon,
)
from nbody_tpu.ops import forces
from nbody_tpu.utils.io import load_checkpoint
from nbody_tpu.utils.profiling import _sync

alphas = [float(x) for x in (sys.argv[1] if len(sys.argv) > 1
                             else "0.75,1.5,2.5").split(",")]
hot_path = sys.argv[2] if len(sys.argv) > 2 else "/tmp/hot1m.npz"

st, at_step = load_checkpoint(hot_path)
st = jax.device_put(st)
_sync(st)
n = st.pos.shape[0]
print(f"[hotcfg] {hot_path} (step {at_step}) n={n}", flush=True)

base = SimConfig(n=n, theta=0.5, use_pallas=True, rebuild_every=16,
                 hold_farmid=8, check_overflow=False)
huge = base.replace(ss_cap=1024, sup_cap=2048, mid_cap=1024, cmid_cap=2048,
                    near_cap=2048, g2_cap_factor=8)


def demand(cfg):
    codes_s, perm, _, size = sort_by_morton(st.pos, cfg)
    ps, ms, cs = forces.pad_sorted(
        st.pos[perm], st.mass[perm], codes_s, cfg.force_tile
    )
    v = jnp.sqrt(jnp.sum(st.vel[perm] ** 2, axis=1))
    a = jnp.sqrt(jnp.sum(st.acc[perm] ** 2, axis=1))
    v = jnp.pad(v, (0, ps.shape[0] - v.shape[0]))
    a = jnp.pad(a, (0, ps.shape[0] - a.shape[0]))

    @jax.jit
    def build(p, m, c, vv, aa):
        d = adaptive_drift(vv, aa, c, size, cfg, k=16.0)
        s_valid = validity_horizon(vv, aa, d, cfg)
        cells, _, bands, _ = forces.build_bands(p, m, c, cfg, drift=d)

        def q(x):
            xs = jnp.sort(x)
            return (jnp.mean(x.astype(jnp.float32)), xs[-1],
                    xs[int(0.999 * (x.shape[0] - 1))])

        return (q(bands.ss_cnt), q(bands.sup_cnt), q(bands.mid_cnt),
                q(bands.cmid_cnt), q(bands.near_cnt), q(bands.win_cnt),
                s_valid, cells.n_cells)

    out = build(ps, ms, cs, v, a)
    names = ["ss", "sup", "mid", "cmid", "near", "wins"]
    txt = "  ".join(
        f"{nm} {float(r[0]):.0f}/p999 {int(r[2])}/max {int(r[1])}"
        for nm, r in zip(names, out[:6])
    )
    print(f"  demand: {txt}  s_valid={int(out[6])} cells={int(out[7])}",
          flush=True)
    return out


def cap_of(q, align=64):
    mx = int(q[1])
    return -(-int(mx * 1.25 + 16) // align) * align


for alpha in alphas:
    print(f"[alpha={alpha}]", flush=True)
    cfg_d = huge.replace(skin_width_cap=alpha)
    qs = demand(cfg_d)
    caps = dict(
        ss_cap=min(cap_of(qs[0]), 1024),
        sup_cap=cap_of(qs[1]),
        mid_cap=cap_of(qs[2]),
        cmid_cap=cap_of(qs[3]),
        near_cap=cap_of(qs[4], align=128),
        win_cap=max(512, cap_of(qs[5])),
    )
    cfg_r = base.replace(skin_width_cap=alpha, **caps)
    print(f"  caps: {caps}  table_gb={cfg_r.table_bytes/2**30:.2f}",
          flush=True)
    sim = Simulation(cfg_r)
    s2 = sim.run_scan(st, 64)
    _sync(s2)
    t0 = time.perf_counter()
    s3 = sim.run_scan(s2, 64)
    _sync(s3)
    dt = (time.perf_counter() - t0) / 64
    print(f"  sustained hot: {dt*1e3:.2f} ms/step ({1.0/dt:.2f} steps/s)",
          flush=True)
