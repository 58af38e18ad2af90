"""Reproduce/diagnose the 1M advance crash at steps 512-768 (round 4).

Advances the 1M production config in 128-step chunks, printing band
diagnostics after each chunk so the last-good state is visible.  Usage:
    python tools/_prof_crash1m.py [n] [total_steps] [chunk]
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import sys, time

import jax, jax.numpy as jnp

from nbody_tpu.config import SimConfig
from nbody_tpu.models.simulation import Simulation
from nbody_tpu.utils.profiling import _sync
from nbody_tpu.utils import metrics

n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
total = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
chunk = int(sys.argv[3]) if len(sys.argv) > 3 else 128

cfg = SimConfig(n=n, rebuild_every=16, hold_farmid=4, check_overflow=False)
sim = Simulation(cfg)
st = jax.device_put(sim.init_state())
_sync(st)
print(f"[crash1m] n={n} total={total} chunk={chunk}", flush=True)

done = 0
while done < total:
    t0 = time.perf_counter()
    st = sim.run_scan(st, chunk)
    _sync(st)
    dt = time.perf_counter() - t0
    done += chunk
    d = metrics.bh_diagnostics(st, cfg)
    print(
        f"  {done:5d}: {dt/chunk*1e3:7.2f} ms/step | cells={d['n_cells']}"
        f" ss={d['ss_mean']:.1f} sup={d['sup_mean']:.1f}"
        f" mid={d['mid_mean']:.1f} cmid={d['cmid_mean']:.1f}"
        f" near={d['near_mean']:.1f} win={d['win_mean']:.1f}"
        f" | ovf c={int(d['cell_overflow'])} g2={int(d['g2_overflow'])}"
        f" ss={int(d['ss_overflow'])} s={int(d['sup_overflow'])}"
        f" m={int(d['mid_overflow'])} cm={int(d['cmid_overflow'])}"
        f" n={int(d['near_overflow'])}",
        flush=True,
    )
print("[crash1m] survived", flush=True)
