"""Advance the production 1M config to a HOT (contracted-core) state and
checkpoint it, so hot-state profilers load instead of re-advancing
(~5 min + a 1M compile per run).  Usage:
    python tools/_prof_mkhot.py [n] [steps] [out.npz]
Profilers accept the checkpoint via NBODY_HOT_STATE=<path>.
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import sys

import jax

from nbody_tpu.config import SimConfig
from nbody_tpu.models.simulation import Simulation
from nbody_tpu.utils.io import save_checkpoint
from nbody_tpu.utils.profiling import _sync

n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
steps = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
out = sys.argv[3] if len(sys.argv) > 3 else "/tmp/hot1m.npz"

from nbody_tpu.config import PRESETS

# the SHIPPING preset (same integrator bench.py runs) so the hot state
# is exactly the one the driver's 1024-step evolution reaches
cfg = PRESETS["v5_bench"].replace(n=n, check_overflow=False)
sim = Simulation(cfg)
st = jax.device_put(sim.init_state())
_sync(st)
done = 0
while done < steps:
    k = min(128, steps - done)
    st = sim.run_scan(st, k)
    _sync(st)
    done += k
    print(f"  advanced {done}", flush=True)
save_checkpoint(out, st, step=steps)
print(f"[mkhot] wrote {out} at step {steps}", flush=True)
