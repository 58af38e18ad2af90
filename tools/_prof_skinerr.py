"""Skin-induced baseline force error vs build-K at a hot (late-time)
state: builds bands with drift bounds for K in {1,2,4,8,16} and compares
the IMMEDIATE (j=0) skinned-band forces vs the unskinned fresh build.
Reuses the cached state from _prof_stale.py."""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import sys
import numpy as np
import jax, jax.numpy as jnp
from nbody_tpu.config import SimConfig
from nbody_tpu.state import ParticleState
from nbody_tpu.ops import bbox, morton, forces
from nbody_tpu.utils.profiling import _sync

n = 1_000_000
cache = f"/tmp/stale_state_{n}_512.npz"
z = np.load(cache)
cfg = SimConfig(n=n, theta=0.5, use_pallas=True, check_overflow=False)
pos = jnp.asarray(z["pos"]); vel = jnp.asarray(z["vel"]); mass = jnp.asarray(z["mass"])

lo, size = bbox.bounding_cube(pos)
cs, perm = morton.morton_sort_30(morton.encode30(pos, lo, size))
ps, ms, csp = forces.pad_sorted(pos[perm], mass[perm], cs, cfg.force_tile)
npad = ps.shape[0]
vel_p = jnp.concatenate([vel[perm], jnp.broadcast_to(vel[perm][-1], (npad - n, 3))])
v = jnp.sqrt(jnp.sum(vel_p**2, axis=1))
w_loc = np.asarray(forces.local_width(csp, size, cfg.force_tile))[:n]
core = w_loc < np.percentile(w_loc, 10)

build = jax.jit(lambda p, m, c, d: forces.build_bands(p, m, c, cfg, drift=d))
apply_b = jax.jit(lambda p, m, su, bd, tb: forces.apply_bands(p, m, su, bd, tb, cfg))

_, su0, bd0, tb0 = build(ps, ms, csp, jnp.zeros_like(v))
a_ref = np.asarray(apply_b(ps, ms, su0, bd0, tb0))[:n]
_sync(a_ref.sum() if False else jnp.zeros(1))

for K in (1, 2, 4, 8, 16):
    drift = jnp.minimum(v * cfg.dt * K * cfg.skin_safety,
                        cfg.max_speed * cfg.dt * K)
    _, su, bd, tb = build(ps, ms, csp, drift)
    a = np.asarray(apply_b(ps, ms, su, bd, tb))[:n]
    num = np.linalg.norm(a - a_ref, axis=1)
    den = np.linalg.norm(a_ref, axis=1) + 1e-6
    rel = num / den
    import jax.numpy as _j
    print(f"K={K:2d}: med {np.median(rel):.2e} p95 {np.percentile(rel,95):.2e} "
          f"core med {np.median(rel[core]):.2e} p95 {np.percentile(rel[core],95):.2e} "
          f"| wins {float(_j.mean(bd.win_cnt)):.0f} near {float(_j.mean(bd.near_cnt)):.0f} "
          f"over n={bool(bd.near_overflow)} s={bool(bd.sup_overflow)} "
          f"m={bool(bd.mid_overflow)} c={bool(bd.cmid_overflow)}", flush=True)
