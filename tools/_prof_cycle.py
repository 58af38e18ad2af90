"""Decompose the K=8 cycle: skinned-band inner step vs rebuild."""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import sys, time
import jax, jax.numpy as jnp
from nbody_tpu.config import SimConfig
from nbody_tpu.init import make_initial_state
from nbody_tpu.ops import bbox, morton, forces, integrate as integ
from nbody_tpu.state import ParticleState
from nbody_tpu.utils.profiling import _sync, time_fn

n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
k = int(sys.argv[2]) if len(sys.argv) > 2 else 8
cfg = SimConfig(n=n, check_overflow=False, rebuild_every=k)
st = make_initial_state(cfg)

# advance ~100 steps first so the state is "settled" like the bench
from nbody_tpu.models.simulation import Simulation
sim = Simulation(cfg)
st = sim.run_scan(st, 16)
_sync(st)

lo, size = bbox.bounding_cube(st.pos)
sc, perm = morton.morton_sort_30(morton.encode30(st.pos, lo, size))
ps, ms_, cs = forces.pad_sorted(st.pos[perm], st.mass[perm], sc, cfg.force_tile)
vel = jnp.pad(st.vel[perm], ((0, ps.shape[0]-n), (0,0)))
acc = jnp.zeros_like(vel)

v = jnp.sqrt(jnp.sum(vel*vel, axis=1))
drift_k = (v * cfg.dt * k) * cfg.skin_safety
drift_0 = jnp.zeros_like(drift_k)

for label, dr in [("unskinned", drift_0), (f"skin(K={k})", drift_k)]:
    f_build = jax.jit(lambda p, m, c, d: forces.build_bands(p, m, c, cfg, drift=d))
    cells, supers, bands, tables = f_build(ps, ms_, cs, dr)
    _sync(bands.sup_cnt)
    f_apply = jax.jit(lambda p, m, su, bd, tb: forces.apply_bands(p, m, su, bd, tb, cfg))
    a = f_apply(ps, ms_, supers, bands, tables); _sync(a)
    tb = time_fn(f_build, ps, ms_, cs, dr, iters=5, warmup=1)
    ta = time_fn(f_apply, ps, ms_, supers, bands, tables, iters=5, warmup=1)
    print(f"{label:12s} build {tb['median_ms']:8.1f} ms  apply {ta['median_ms']:7.1f} ms  "
          f"sup={float(jnp.mean(bands.sup_cnt)):.0f} mid={float(jnp.mean(bands.mid_cnt)):.0f} "
          f"cmid={float(jnp.mean(bands.cmid_cnt)):.0f} near={float(jnp.mean(bands.near_cnt)):.0f} "
          f"wins={float(jnp.mean(bands.win_cnt)):.0f}", flush=True)

# full inner-step (apply+integrate) scanned x k, amortized — the true inner cost
cells, supers, bands, tables = jax.jit(
    lambda p, m, c, d: forces.build_bands(p, m, c, cfg, drift=d))(ps, ms_, cs, drift_k)
_sync(bands.sup_cnt)

@jax.jit
def inner_k(p, v, m, su, bd, tb):
    def body(c2, _):
        p, v = c2
        a = forces.apply_bands(p, m, su, bd, tb, cfg)
        s2 = integ.integrate(ParticleState(pos=p, vel=v, mass=m, acc=a), a, cfg)
        return (s2.pos, s2.vel), None
    (p, v), _ = jax.lax.scan(body, (p, v), None, length=k)
    return p, v
_ = inner_k(ps, vel, ms_, supers, bands, tables); _sync(_[0])
ti = time_fn(inner_k, ps, vel, ms_, supers, bands, tables, iters=5, warmup=1)
print(f"inner x{k} scanned: {ti['median_ms']:.1f} ms total -> {ti['median_ms']/k:.1f} ms/step", flush=True)
