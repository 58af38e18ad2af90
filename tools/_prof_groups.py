"""Sub-phase timing of the band rebuild at 1M on TPU."""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import sys, time
import jax, jax.numpy as jnp
from nbody_tpu.config import SimConfig
from nbody_tpu.init import make_initial_state
from nbody_tpu.ops import bbox, morton, forces
from nbody_tpu.ops.cells import build_source_cells
from nbody_tpu.utils.profiling import _sync, time_fn

n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
cfg = SimConfig(n=n, check_overflow=False)
st = make_initial_state(cfg)
lo, size = bbox.bounding_cube(st.pos)
sc, perm = morton.morton_sort_30(morton.encode30(st.pos, lo, size))
ps, ms, cs = forces.pad_sorted(st.pos[perm], st.mass[perm], sc, cfg.force_tile)
drift = jnp.full((ps.shape[0],), 10.0, jnp.float32)

f_cells = jax.jit(lambda p, m, c, d: build_source_cells(
    c, p, m, cfg.force_tile, cfg.g, cfg.cell_capacity, lo, size, drift_sorted=d))
cells = f_cells(ps, ms, cs, drift)
_sync(cells.gmass)
f_sup = jax.jit(forces.make_supers)
sup = f_sup(cells); _sync(sup.com)
f_ss = jax.jit(forces.make_supersupers)
ss = f_ss(sup); _sync(ss.com)
f_subs = jax.jit(lambda p, d: forces.target_subspheres(p, cfg.force_tile, drift=d))
subs = f_subs(ps, drift); _sync(subs.center)
f_bands = jax.jit(lambda ts, s2, s, ce: forces.cell_band_lists(ts, s2, s, ce, cfg))
bands = f_bands(subs, ss, sup, cells); _sync(bands.sup_cnt)
f_tab = jax.jit(lambda ce, s, s2, b: forces.build_cell_tables(ce, s, s2, b))
tab = f_tab(cells, sup, ss, bands); _sync(tab.tx)

for name, fn, args in [
    ("cells", f_cells, (ps, ms, cs, drift)),
    ("supers", f_sup, (cells,)),
    ("supersupers", f_ss, (sup,)),
    ("subspheres", f_subs, (ps, drift)),
    ("band_lists", f_bands, (subs, ss, sup, cells)),
    ("tables", f_tab, (cells, sup, ss, bands)),
]:
    t = time_fn(fn, *args, iters=6, warmup=1)
    print(f"{name:12s} {t['median_ms']:8.2f} ms (min {t['min_ms']:.2f})", flush=True)
