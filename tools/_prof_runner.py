"""Close the arithmetic on the adaptive runner at 1M: time the real
nested make_adaptive_runner for `steps` steps (reporting the rebuild
count), one bare rebuild, and one far+mid apply — so
  runner == inner_step * steps + rebuild * n_rb
can be checked phase by phase (companion to _prof_inner.py).

Usage: _prof_runner.py [n] [steps]
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import sys, time

import jax, jax.numpy as jnp

from nbody_tpu.config import SimConfig
from nbody_tpu.init import make_initial_state
from nbody_tpu.models.simulation import (
    make_adaptive_runner, _adaptive_rebuild_fn, _pad_cycle_state, _flat,
)
from nbody_tpu.utils.profiling import _sync

n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
steps = int(sys.argv[2]) if len(sys.argv) > 2 else 32

cfg = SimConfig(n=n, rebuild_every=16, hold_farmid=4, check_overflow=False)
st = make_initial_state(cfg)
st = jax.device_put(st)
_sync(st)

run = jax.jit(make_adaptive_runner(cfg, steps, return_stats=True))
out, n_rb = run(st)
_sync(out)
t0 = time.perf_counter()
out2, n_rb = run(st)
_sync(out2)
dt = time.perf_counter() - t0
print(f"runner {steps} steps: {dt*1e3/steps:7.2f} ms/step  n_rb={int(n_rb)}",
      flush=True)

# one bare rebuild, jitted standalone
pos, vel, mass, acc, orig = _pad_cycle_state(st, cfg.force_tile)
reb = jax.jit(lambda p, v, m, a, o: _adaptive_rebuild_fn(cfg)(
    _flat(p), _flat(v), m, _flat(a), o, jnp.int32(cfg.rebuild_every)))
built, (s_valid, k_env) = reb(pos, vel, mass, acc, orig)
_sync(built[0])
t0 = time.perf_counter()
built, (s_valid, k_env) = reb(pos, vel, mass, acc, orig)
_sync(built[0])
print(f"one rebuild: {(time.perf_counter()-t0)*1e3:7.2f} ms  "
      f"s_valid={int(s_valid)} k_env={int(k_env)}", flush=True)

# fit in-situ inner-step and rebuild costs from multiple step counts:
# total(s) = x * s + y * n_rb(s) + c
for s in (64, 128):
    run_s = jax.jit(make_adaptive_runner(cfg, s, return_stats=True))
    out, n_rb = run_s(st)
    _sync(out)
    t0 = time.perf_counter()
    out, n_rb = run_s(st)
    _sync(out)
    dt = time.perf_counter() - t0
    print(f"runner {s} steps: {dt*1e3/s:7.2f} ms/step  n_rb={int(n_rb)}  "
          f"total={dt*1e3:.0f} ms", flush=True)
