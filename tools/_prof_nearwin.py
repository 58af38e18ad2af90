"""Near-band window occupancy stats at a bench-like state.

The near P2P kernel fetches one aligned 128-wide window per DISTINCT
window entry (same-window child runs are OR-merged into one lane mask
by forces._window_masks); executed near flops = win_cnt * 128 * B * 18.
This tool reports the residual masked-lane waste:

  * occupancy    — live mask bits / fetched lanes (the useful fraction)
  * KSEG rounding— segments of 8 windows per wait round

Usage: _prof_nearwin.py [advance_steps] [N]
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import sys
import time

import jax
import jax.numpy as jnp

from nbody_tpu.config import SimConfig
from nbody_tpu.models.simulation import Simulation, sort_by_morton, \
    adaptive_drift
from nbody_tpu.ops import forces
from nbody_tpu.utils.profiling import _sync

steps = int(sys.argv[1]) if len(sys.argv) > 1 else 128
n = int(sys.argv[2]) if len(sys.argv) > 2 else 1_000_000

cfg = SimConfig(n=n, theta=0.5, use_pallas=True, rebuild_every=16,
                hold_farmid=4, check_overflow=False)
sim = Simulation(cfg)
st = jax.device_put(sim.init_state())
_sync(st)
for i in range(max(steps // 128, 0)):
    st = sim.run_scan(st, 128)
    _sync(st)
    print(f"  advanced {(i+1)*128}", flush=True)


def stats(drift, label):
    codes_s, perm, _, size = sort_by_morton(st.pos, cfg)
    ps, ms, cs = forces.pad_sorted(
        st.pos[perm], st.mass[perm], codes_s, cfg.force_tile
    )
    d = None
    if drift:
        v = jnp.sqrt(jnp.sum(st.vel[perm] ** 2, axis=1))
        a = jnp.sqrt(jnp.sum(st.acc[perm] ** 2, axis=1))
        v = jnp.pad(v, (0, ps.shape[0] - v.shape[0]))
        a = jnp.pad(a, (0, ps.shape[0] - a.shape[0]))
        d = adaptive_drift(v, a, cs, size, cfg)
    cells, supers, bands, tables = jax.jit(
        lambda p, m, c, dd: forces.build_bands(p, m, c, cfg, drift=dd)
    )(ps, ms, cs, d)
    _sync(bands.win_cnt)

    @jax.jit
    def win_stats(bands):
        wins = bands.win_cnt
        segs = (wins + 7) // 8
        live = jnp.sum(jax.lax.population_count(bands.win_mask))
        return (
            jnp.mean(wins.astype(jnp.float32)),
            live.astype(jnp.float32),
            jnp.sum(wins).astype(jnp.float32),
            jnp.mean(segs.astype(jnp.float32)) * 8,
        )

    wi, livec, wsum, ex = [float(x) for x in win_stats(bands)]
    t = bands.win_cnt.shape[0]
    print(f"[{label}] windows/target {wi:.1f}  "
          f"occupancy {livec / max(wsum * 128, 1):.3f}  "
          f"exec win (KSEG8) {ex:.1f} ({ex / max(wi, 1e-9):.2f}x rounding)",
          flush=True)

    # time the near kernel alone on this structure
    @jax.jit
    def near_only(p, sm, bd):
        return forces.apply_near(p, p, sm, bd, cfg)

    acc = near_only(ps, ms, bands)
    _sync(acc)
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        acc = near_only(ps, ms, bands)
        _sync(acc)
        ts.append(time.perf_counter() - t0)
    ts.sort()
    near_ms = ts[len(ts) // 2] * 1e3 - 32.0   # relay overhead
    gfl = 18 * wsum * 128 * cfg.force_tile / 1e9
    print(f"[{label}] near kernel: {near_ms:.1f} ms (net of ~32 ms relay), "
          f"executed {gfl:.0f} Gflop -> {gfl / near_ms:.2f} Tflop/s eff",
          flush=True)

    # far + mid for reference
    @jax.jit
    def farmid_only(p, sup, tab):
        return forces.apply_farmid(p, sup, tab, cfg)

    acc2 = farmid_only(ps, supers, tables)
    _sync(acc2)
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        acc2 = farmid_only(ps, supers, tables)
        _sync(acc2)
        ts.append(time.perf_counter() - t0)
    ts.sort()
    print(f"[{label}] far+mid: {ts[len(ts)//2]*1e3 - 32.0:.1f} ms "
          f"(net of ~32 ms relay)", flush=True)


stats(False, "live  ")
stats(True, "skins ")
