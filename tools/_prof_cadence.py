"""Adaptive-runner rebuild cadence + speed from the IC and from the hot
cached state.  Usage: _prof_cadence.py [K] [R] [steps]"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import sys, time
import numpy as np
import jax, jax.numpy as jnp
from nbody_tpu.config import SimConfig
from nbody_tpu.state import ParticleState
from nbody_tpu.models.simulation import make_adaptive_runner
from nbody_tpu.init import make_initial_state
from nbody_tpu.utils.profiling import _sync

K = int(sys.argv[1]) if len(sys.argv) > 1 else 16
R = int(sys.argv[2]) if len(sys.argv) > 2 else 4
steps = int(sys.argv[3]) if len(sys.argv) > 3 else 64
alpha = float(sys.argv[4]) if len(sys.argv) > 4 else 0.75
n = 1_000_000
cfg = SimConfig(n=n, theta=0.5, use_pallas=True, rebuild_every=K,
                hold_farmid=R, skin_width_cap=alpha, check_overflow=False)
print(f"K={K} R={R} alpha={alpha}", flush=True)
run = jax.jit(make_adaptive_runner(cfg, steps, return_stats=True))

def measure(label, st):
    st = jax.device_put(st); _sync(st)
    out, rb = run(st); _sync(out)      # compile
    t0 = time.perf_counter()
    out, rb = run(out); _sync(out)
    dt_ms = (time.perf_counter() - t0) * 1e3 / steps
    print(f"{label}: {dt_ms:.1f} ms/step, {int(rb)} rebuilds / {steps} steps "
          f"(cadence {steps/max(int(rb),1):.1f})", flush=True)

measure("IC    ", make_initial_state(cfg))
cache = f"/tmp/stale_state_{n}_512.npz"
if _os.path.exists(cache):
    z = np.load(cache)
    hot = ParticleState(pos=jnp.asarray(z["pos"]), vel=jnp.asarray(z["vel"]),
                        mass=jnp.asarray(z["mass"]), acc=jnp.asarray(z["acc"]))
    measure("hot512", hot)
