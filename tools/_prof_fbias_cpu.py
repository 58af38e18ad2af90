"""CPU force-accuracy scan of the production band path vs fp64 direct —
the debuggable twin of tools/_prof_fbias.py (which found a
theta-INDEPENDENT ~3% halo force error at the 1M hot state).

Runs the disk-galaxy IC at small N on CPU (use_pallas=False), reference
in fp64 numpy, and scans theta / force_tile / no_ss, reporting rel-error
quantiles split by |a| decile (halo = weak-|a| particles, where the 1M
bias lives).

Usage: python tools/_prof_fbias_cpu.py [n]
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import os
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import sys

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from nbody_tpu.config import SimConfig, PRESETS
from nbody_tpu.init import make_initial_state
from nbody_tpu.models.simulation import sort_by_morton
from nbody_tpu.ops import forces

n = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000

base = PRESETS["v5_bench"].replace(n=n, use_pallas=False,
                                   check_overflow=False)
st = make_initial_state(base)
pos = np.asarray(st.pos, np.float64)
mass = np.asarray(st.mass, np.float64)

# fp64 direct reference (blocked numpy)
soft = forces.soft_term(base)
a_true = np.zeros((n, 3))
for i0 in range(0, n, 4096):
    pb = pos[i0:i0 + 4096]
    d = pos[None, :, :] - pb[:, None, :]
    r2 = np.sum(d * d, axis=-1) + soft
    w = base.g * mass[None, :] * r2 ** -1.5
    a_true[i0:i0 + 4096] = np.sum(w[..., None] * d, axis=1)
print(f"n={n} fp64 direct done", flush=True)

for ov in ({}, {"theta": 0.3}, {"theta": 0.2}, {"force_tile": 256},
           {"no_ss": True}, {"no_ss": True, "theta": 0.3},
           {"force_tile": 256, "no_ss": True}):
    cfg = base.replace(**ov)
    codes_s, perm, _, _ = sort_by_morton(st.pos, cfg)
    ps, ms, cs = forces.pad_sorted(st.pos[perm], st.mass[perm], codes_s,
                                   cfg.force_tile)
    a_prod = np.asarray(jax.jit(
        lambda p, m, c: forces.bh_forces_grouped(p, m, c, cfg)
    )(ps, ms, cs))[:n]
    at = a_true[np.asarray(perm)]
    da = np.linalg.norm(a_prod - at, axis=1)
    den = np.linalg.norm(at, axis=1) + 1e-12
    rel = da / den
    q = np.percentile(rel, [50, 90, 99])
    lo_a = den <= np.percentile(den, 50)   # weak-|a| half = halo
    print(f"[{ov or 'ship'}] rel_mean={rel.mean():.2e} "
          f"q50={q[0]:.2e} q90={q[1]:.2e} q99={q[2]:.2e} "
          f"halo_mean={rel[lo_a].mean():.2e} "
          f"core_mean={rel[~lo_a].mean():.2e}", flush=True)
