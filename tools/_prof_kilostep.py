"""Kilostep energy drift at 1M.  Usage: _prof_kilostep.py [K] [R] [N]"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import os
import sys
import time
import jax
from nbody_tpu.config import SimConfig
from nbody_tpu.models.simulation import Simulation
from nbody_tpu.utils import metrics
from nbody_tpu.utils.profiling import _sync

K = int(sys.argv[1]) if len(sys.argv) > 1 else 32
R = int(sys.argv[2]) if len(sys.argv) > 2 else 8
N = int(sys.argv[3]) if len(sys.argv) > 3 else 1_000_000
A = os.environ.get("KS_ADAPTIVE", "1") == "1"
ALPHA = float(os.environ.get("KS_ALPHA", "0.75"))
caps = {}
if os.environ.get("KS_CAPS"):
    s_, m_, c_, n_ = (int(x) for x in os.environ["KS_CAPS"].split(","))
    caps = dict(sup_cap=s_, mid_cap=m_, cmid_cap=c_, near_cap=n_)
# generic SimConfig overrides, e.g. KS_OVER="force_tile=512,farmid_span_rebuilds=1"
for kv in filter(None, os.environ.get("KS_OVER", "").split(",")):
    k_, v_ = kv.split("=")
    f_ = SimConfig.__dataclass_fields__[k_].type
    caps[k_] = (v_.lower() in ("1", "true")) if "bool" in str(f_) else (
        float(v_) if "float" in str(f_) else int(v_))
cfg = SimConfig(n=N, theta=0.5, use_pallas=True, adaptive_rebuild=A,
                rebuild_every=K, hold_farmid=R, skin_width_cap=ALPHA,
                check_overflow=False, **caps)
print(f"caps={caps}", flush=True)
print(f"K={K} R={R} N={N} adaptive={A} alpha={ALPHA}", flush=True)
sim = Simulation(cfg)
st = sim.init_state()
st = jax.device_put(st); _sync(st)
e0 = float(metrics.total_energy(st, cfg))
print(f"E0 = {e0:.6e}", flush=True)
CH = int(os.environ.get("KS_CHUNK", "128"))
t0 = time.perf_counter()
for i in range(1000 // CH):
    st = sim.run_scan(st, CH)
    _sync(st)
    e = float(metrics.total_energy(st, cfg))
    ke = float(metrics.kinetic_energy(st))
    print(f"  {CH*(i+1)} steps, {time.perf_counter()-t0:.1f}s  "
          f"E={e:.4e} drift={abs(e-e0)/abs(e0):.5f} KE={ke:.3e}", flush=True)
rem = 1000 - (1000 // CH) * CH
if rem:
    st = sim.run_scan(st, rem)
    _sync(st)
e1 = float(metrics.total_energy(st, cfg))
print(f"E1 = {e1:.6e}  kilostep drift = {metrics.energy_drift(e0, e1):.6f}", flush=True)
print(f"KE = {float(metrics.kinetic_energy(st)):.4e}", flush=True)
