"""Live-view FPS at the reference's flagship interactive workload
(N=500k, nbody_v5.cu:34,385-389): drives the SimViewer frame loop
directly (no HTTP) and reports wall-clock FPS with the persistent
adaptive stepper vs the per-call run_scan path it replaced.

Usage: _prof_view.py [n] [frames] [steps_per_frame]
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import sys
import time

import jax

from nbody_tpu.config import SimConfig
from nbody_tpu.models.simulation import Simulation
from nbody_tpu.viz.render import render_frame
from nbody_tpu.viz.viewer import SimViewer
from nbody_tpu.utils.profiling import _sync

n = int(sys.argv[1]) if len(sys.argv) > 1 else 500_000
frames = int(sys.argv[2]) if len(sys.argv) > 2 else 24
spf = int(sys.argv[3]) if len(sys.argv) > 3 else 1

cfg = SimConfig(n=n, rebuild_every=16, hold_farmid=4)
sim = Simulation(cfg)
state = jax.device_put(sim.init_state())
_sync(state)


def drive(viewer, label):
    # one warmup frame to compile, then timed frames
    viewer._stop.clear()
    t_frames = []
    for i in range(frames + 1):
        t0 = time.perf_counter()
        # one _loop iteration, inlined (no thread): step + render + encode
        if viewer._stepper is not None:
            viewer._stepper.advance(viewer.steps_per_frame)
            pos, vel = viewer._stepper.pos_sorted, viewer._stepper.vel_sorted
        else:
            viewer.state = viewer.sim.run_scan(viewer.state, viewer.steps_per_frame)
            pos, vel = viewer.state.pos, viewer.state.vel
        cam = viewer.camera
        frame = render_frame(pos, vel, cam.distance, cam.rot_x, cam.rot_y,
                             cfg.render_width, cfg.render_height,
                             viewer.mode, viewer.exposure)
        viewer._encode(frame)       # host fetch = device sync
        if i:
            t_frames.append(time.perf_counter() - t0)
        # orbit while streaming, like a user dragging (camera params are
        # traced, so this never recompiles)
        cam.drag(6.0, 1.5)
    t_frames.sort()
    med = t_frames[len(t_frames) // 2]
    print(f"[{label}] n={n} spf={spf} median frame {med*1e3:.1f} ms "
          f"({1.0/med:.2f} FPS), best {t_frames[0]*1e3:.1f} ms, "
          f"worst {t_frames[-1]*1e3:.1f} ms", flush=True)
    return med


v1 = SimViewer(sim, state, cfg, steps_per_frame=spf)
assert v1._stepper is not None
drive(v1, "stepper")

v0 = SimViewer(sim, state, cfg, steps_per_frame=spf)
v0._stepper = None
drive(v0, "run_scan")
