"""Live-view FPS at the reference's flagship interactive workload
(N=500k, nbody_v5.cu:34,385-389): runs the REAL SimViewer thread loop
(software-pipelined: device step+render+quantize for frame i+1 enqueued
before the host fetch+JPEG of frame i) and reports published-frame FPS.

Usage: _prof_view.py [n] [frames] [steps_per_frame]
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import sys
import time

import jax

from nbody_tpu.config import SimConfig
from nbody_tpu.models.simulation import Simulation
from nbody_tpu.viz.viewer import SimViewer
from nbody_tpu.utils.profiling import _sync

n = int(sys.argv[1]) if len(sys.argv) > 1 else 500_000
frames = int(sys.argv[2]) if len(sys.argv) > 2 else 24
spf = int(sys.argv[3]) if len(sys.argv) > 3 else 1

cfg = SimConfig(n=n, rebuild_every=16, hold_farmid=4)
sim = Simulation(cfg)
state = jax.device_put(sim.init_state())
_sync(state)

viewer = SimViewer(sim, state, cfg, steps_per_frame=spf)
assert viewer._stepper is not None
viewer.start()

# first published frame includes the compile; exclude it from the rate
t_dead = time.perf_counter() + 900
while viewer.step_count == 0:
    time.sleep(0.1)
    assert time.perf_counter() < t_dead, "first frame never published"
c0 = viewer.step_count
t0 = time.perf_counter()
target = c0 + frames * spf
while viewer.step_count < target:
    time.sleep(0.02)
    assert time.perf_counter() < t_dead, "frame loop stalled"
t1 = time.perf_counter()
c1 = viewer.step_count

viewer._stop.set()
viewer._thread.join(timeout=60)

published = (c1 - c0) // spf
fps = published / (t1 - t0)
print(f"[pipelined] n={n} spf={spf} {published} frames in "
      f"{t1 - t0:.2f}s = {fps:.2f} FPS "
      f"({1e3 / fps:.1f} ms/frame)", flush=True)
