"""Sustained hot-state rate for a config variant, from the 1M hot
checkpoint (tools/_prof_mkhot.py).  Usage:
    python tools/_prof_hotrate.py [hot.npz] [key=val ...]
e.g.  _prof_hotrate.py /tmp/hot1m.npz force_tile=512 hold_farmid=8
      _prof_hotrate.py /tmp/hot1m.npz refresh_moments=1
Also prints the near-IC sustained rate when NBODY_HOTRATE_IC=1 (fresh
initial state, same variant) so one run grades both epochs.
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import os, sys, time

import jax

from nbody_tpu.config import SimConfig
from nbody_tpu.models.simulation import Simulation
from nbody_tpu.utils.io import load_checkpoint
from nbody_tpu.utils.profiling import _sync

hot_path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/hot1m.npz"
over = {}
for kv in sys.argv[2:]:
    k, v = kv.split("=")
    f = SimConfig.__dataclass_fields__[k].type
    over[k] = (v.lower() in ("1", "true")) if "bool" in str(f) else (
        float(v) if "float" in str(f) else int(v))

st, at_step = load_checkpoint(hot_path)
st = jax.device_put(st)
_sync(st)
n = st.pos.shape[0]
cfg = SimConfig(n=n, theta=0.5, use_pallas=True, rebuild_every=16,
                hold_farmid=8, check_overflow=False, **over)
print(f"[hotrate] n={n} step={at_step} overrides={over}", flush=True)
sim = Simulation(cfg)

s2 = sim.run_scan(st, 64)   # compile + settle k_env
_sync(s2)
for label, reps in (("hot", 2),):
    t0 = time.perf_counter()
    s3 = s2
    for _ in range(reps):
        s3 = sim.run_scan(s3, 64)
    _sync(s3)
    dt = (time.perf_counter() - t0) / (64 * reps)
    print(f"  sustained {label}: {dt*1e3:.2f} ms/step "
          f"({1.0/dt:.2f} steps/s)", flush=True)

if os.environ.get("NBODY_HOTRATE_IC"):
    ic = jax.device_put(sim.init_state())
    _sync(ic)
    ic2 = sim.run_scan(ic, 64)
    _sync(ic2)
    t0 = time.perf_counter()
    ic3 = sim.run_scan(ic2, 64)
    _sync(ic3)
    dt = (time.perf_counter() - t0) / 64
    print(f"  sustained IC:  {dt*1e3:.2f} ms/step "
          f"({1.0/dt:.2f} steps/s)", flush=True)
