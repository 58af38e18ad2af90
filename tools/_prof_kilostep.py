"""Kilostep energy-drift gate at 1M — runs THE canonical protocol
(nbody_tpu.utils.metrics.drift_protocol, the exact code path bench.py
reports from), so the gate and the driver artifact cannot diverge.

Usage: _prof_kilostep.py [K] [R] [N]
Env:   KS_ADAPTIVE=0|1  KS_ALPHA  KS_CAPS=sup,mid,cmid,near
       KS_OVER="force_tile=512,farmid_span_rebuilds=1,..."
       KS_STEPS (default 1024)  KS_CHUNK (default 32 — bench.py's frames)
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import os
import sys
import jax
from nbody_tpu.config import SimConfig, PRESETS
from nbody_tpu.models.simulation import Simulation
from nbody_tpu.utils import metrics
from nbody_tpu.utils.profiling import _sync

K = int(sys.argv[1]) if len(sys.argv) > 1 else 16
R = int(sys.argv[2]) if len(sys.argv) > 2 else 8
N = int(sys.argv[3]) if len(sys.argv) > 3 else 1_000_000
A = os.environ.get("KS_ADAPTIVE", "1") == "1"
ALPHA = float(os.environ.get("KS_ALPHA", "0.75"))
caps = {}
if os.environ.get("KS_CAPS"):
    s_, m_, c_, n_ = (int(x) for x in os.environ["KS_CAPS"].split(","))
    caps = dict(sup_cap=s_, mid_cap=m_, cmid_cap=c_, near_cap=n_)
# generic SimConfig overrides, e.g. KS_OVER="force_tile=256,refresh_moments=1"
for kv in filter(None, os.environ.get("KS_OVER", "").split(",")):
    k_, v_ = kv.split("=")
    f_ = SimConfig.__dataclass_fields__[k_].type
    caps[k_] = (v_.lower() in ("1", "true")) if "bool" in str(f_) else (
        float(v_) if "float" in str(f_) else int(v_))
# base = THE shipping preset (what bench.py runs), so the bare
# invocation `_prof_kilostep.py 16 8` gates exactly the shipping config
cfg = PRESETS["v5_bench"].replace(
    n=N, theta=0.5, use_pallas=True, adaptive_rebuild=A,
    rebuild_every=K, hold_farmid=R, skin_width_cap=ALPHA,
    check_overflow=False, **caps)
STEPS = int(os.environ.get("KS_STEPS", "1024"))
CH = int(os.environ.get("KS_CHUNK", "32"))
print(f"caps={caps}", flush=True)
print(f"K={K} R={R} N={N} adaptive={A} alpha={ALPHA} steps={STEPS} chunk={CH}",
      flush=True)
sim = Simulation(cfg)
st = sim.init_state()
st = jax.device_put(st); _sync(st)

LOG_EVERY = int(os.environ.get("KS_LOG_EVERY", "128"))
e0 = float(metrics.total_energy(st, cfg))
print(f"E0 = {e0:.6e}", flush=True)

def log(steps, secs, state):
    if steps % LOG_EVERY:
        return
    e = float(metrics.total_energy(state, cfg))
    ke = float(metrics.kinetic_energy(state))
    print(f"  {steps} steps, {secs:.1f}s  E={e:.4e} "
          f"drift={abs(e - e0) / abs(e0):.5f} KE={ke:.3e}", flush=True)

dp = metrics.drift_protocol(sim, st, n_steps=STEPS, chunk=CH, log=log)
print(f"E1 = {dp['e1']:.6e}  drift_{dp['drift_steps']} = {dp['drift']:.6f}",
      flush=True)
print(f"avg {dp['avg_steps_per_sec']:.2f} steps/s  "
      f"hot {dp['hot_steps_per_sec']:.2f} steps/s  "
      f"({dp['seconds']:.0f}s total)", flush=True)
print(f"KE = {float(metrics.kinetic_energy(dp['state'])):.4e}", flush=True)

if os.environ.get("KS_SAVE"):
    # gate runs double as hot-checkpoint makers (tools/_prof_mkhot.py)
    from nbody_tpu.utils.io import save_checkpoint

    save_checkpoint(os.environ["KS_SAVE"], dp["state"], step=STEPS)
    print(f"saved hot state -> {os.environ['KS_SAVE']}", flush=True)
