"""Run the production sharded runners on the REAL TPU with Pallas on.

Multi-chip hardware is unavailable (single tunnelled v5e chip), but a
1-device mesh still routes every shard_map path — halo ppermute/
all_gather (identity at D=1), the owner-computes windowed cell build +
_stitch_cells, per-slab classification — through Mosaic, whose layout/
aliasing decisions under shard_map are otherwise unexercised (round-3
weakness 6: all sharded tests run use_pallas=False on CPU).

Checks BOTH production runners against their single-chip twins on the
same chip (same dtype, same kernels — agreement should be tight):
  * fixed-K  make_sharded_runner   vs make_cycle_runner
  * adaptive make_sharded_adaptive_runner vs make_adaptive_runner
Prints max position deltas and the rebuild counts; exits nonzero on
disagreement so this can run as a hardware gate.

Usage:  python tools/_prof_shard_tpu.py [n]     (default 131072)
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import sys

import jax
import numpy as np

from nbody_tpu.config import SimConfig
from nbody_tpu.init import make_initial_state
from nbody_tpu.models.simulation import (
    Simulation, make_adaptive_runner, make_cycle_runner,
)
from nbody_tpu.parallel.shard import (
    make_mesh, make_sharded_adaptive_runner, make_sharded_runner,
)
from nbody_tpu.utils.profiling import _sync

n = int(sys.argv[1]) if len(sys.argv) > 1 else 131072
assert jax.devices()[0].platform != "cpu", "this gate needs the real TPU"
mesh = make_mesh(1)

cfg = SimConfig(n=n, theta=0.5, use_pallas=True, rebuild_every=8,
                hold_farmid=4, check_overflow=False)
st = jax.device_put(make_initial_state(cfg))
_sync(st)
print(f"[shard-tpu] n={n} mesh={mesh.shape} platform={jax.devices()[0]}",
      flush=True)

failures = 0


def compare(label, got, want):
    global failures
    dp = float(np.max(np.linalg.norm(
        np.asarray(got.pos) - np.asarray(want.pos), axis=1)))
    moved = float(np.median(np.linalg.norm(
        np.asarray(want.pos) - np.asarray(st.pos), axis=1)))
    ok = dp < 1e-3 * max(moved, 1.0)
    print(f"  {label}: max|dp|={dp:.3e} (median moved {moved:.3f}) "
          f"{'OK' if ok else 'MISMATCH'}", flush=True)
    failures += 0 if ok else 1


# fixed-K: 2 cycles of 8
want = jax.jit(make_cycle_runner(cfg, 2, 8))(st)
_sync(want)
got = make_sharded_runner(cfg, mesh, 2, 8)(st)
_sync(got)
compare("fixed-K  (Mosaic under shard_map)", got, want)

# adaptive: 16 steps, rebuild schedule must match exactly
acfg = cfg.replace(adaptive_rebuild=True)
want2, rb1 = jax.jit(make_adaptive_runner(acfg, 16, return_stats=True))(st)
_sync(want2)
got2, rb2 = make_sharded_adaptive_runner(acfg, mesh, 16,
                                         return_stats=True)(st)
_sync(got2)
print(f"  adaptive rebuilds: single={int(rb1)} sharded={int(rb2)}",
      flush=True)
failures += 0 if int(rb1) == int(rb2) else 1
compare("adaptive (Mosaic under shard_map)", got2, want2)

print(f"[shard-tpu] {'PASS' if failures == 0 else f'FAIL ({failures})'}",
      flush=True)
sys.exit(1 if failures else 0)
