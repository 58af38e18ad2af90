"""Near-band window fragmentation stats at a bench-like state.

The near P2P kernel fetches one aligned 128-wide window per SPAN and
masks dead lanes; executed near flops = span_cnt * 128 * B * 18.  This
tool quantifies where the masked-lane waste comes from:

  * occupancy        — live lanes / fetched lanes (the useful fraction)
  * distinct windows — window fetches a per-window dedup would make
  * KSEG rounding    — segments of 8 windows per wait round

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
    _sync(bands.span_cnt)

    @jax.jit
    def win_stats(bands):
        w = bands.span_first // 128                       # [T, K]
        live = bands.span_count > 0
        big = jnp.int32(2**30)
        ws = jax.lax.sort(jnp.where(live, w, big), dimension=1)
        newwin = (ws != jnp.concatenate(
            [jnp.full((ws.shape[0], 1), -1, jnp.int32), ws[:, :-1]], axis=1
        )) & (ws < big)
        distinct = jnp.sum(newwin.astype(jnp.int32), axis=1)   # [T]
        spans = bands.span_cnt
        segs = (spans + 7) // 8
        segs_d = (distinct + 7) // 8
        return (
            jnp.mean(spans.astype(jnp.float32)),
            jnp.mean(distinct.astype(jnp.float32)),
            jnp.sum(bands.span_count).astype(jnp.float32),
            jnp.sum(spans).astype(jnp.float32),
            jnp.mean(segs.astype(jnp.float32)) * 8,
            jnp.mean(segs_d.astype(jnp.float32)) * 8,
        )

    sp, di, livec, spsum, ex, exd = [float(x) for x in win_stats(bands)]
    t = bands.span_cnt.shape[0]
    print(f"[{label}] spans/target {sp:.1f}  distinct windows {di:.1f}  "
          f"occupancy {livec / (spsum * 128):.3f}  "
          f"exec win (KSEG8) {ex:.1f} -> dedup {exd:.1f}  "
          f"({exd / ex:.2%} of current)", flush=True)

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
    gfl = 18 * spsum * 128 * cfg.force_tile / 1e9
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
