"""Which part of build_source_cells costs 126 ms at 1M?"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import sys
import jax, jax.numpy as jnp
from jax import lax
from nbody_tpu.config import SimConfig
from nbody_tpu.init import make_initial_state
from nbody_tpu.ops import bbox, morton, forces
from nbody_tpu.ops.cells import (
    build_source_cells, _cumsum_prefix, N_DEPTH, MAX_DEPTH, _I32,
)
from nbody_tpu.utils.profiling import _sync, time_fn

n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
cfg = SimConfig(n=n, check_overflow=False)
st = make_initial_state(cfg)
lo, size = bbox.bounding_cube(st.pos)
sc, perm = morton.morton_sort_30(morton.encode30(st.pos, lo, size))
ps, ms, cs = forces.pad_sorted(st.pos[perm], st.mass[perm], sc, cfg.force_tile)
b = cfg.force_tile
g_cap = cfg.cell_capacity
npad = ps.shape[0]


def stage_bnd(codes):
    idx = jnp.arange(npad, dtype=_I32)
    prev = jnp.concatenate([codes[:1], codes[:-1]])
    x = codes ^ prev
    lcp = jnp.where(x == 0, 30, lax.clz(x).astype(_I32) - 2)
    depths = jnp.arange(N_DEPTH, dtype=_I32)[None, :]
    bnd = lcp[:, None] < 3 * depths
    bnd = bnd.at[0, :].set(True)
    return bnd, idx


def stage_cut(codes):
    bnd, idx = stage_bnd(codes)
    start_d = lax.cummax(jnp.where(bnd, idx[:, None], -1), axis=0)
    nxt = jnp.concatenate([bnd[1:], jnp.ones((1, N_DEPTH), bool)], axis=0)
    end_d = lax.cummin(jnp.where(nxt, idx[:, None] + 1, npad + 1), axis=0, reverse=True)
    cnt_d = end_d - start_d
    cut_depth = jnp.sum((cnt_d > b).astype(_I32), axis=1)
    return cut_depth, start_d[:, MAX_DEPTH]


def stage_sorts(codes):
    cut_depth, st10 = stage_cut(codes)
    idx = jnp.arange(npad, dtype=_I32)
    bnd, _ = stage_bnd(codes)
    oh = jnp.arange(N_DEPTH, dtype=_I32)[None, :]
    grp_b = jnp.any(bnd & (oh == jnp.minimum(cut_depth, MAX_DEPTH)[:, None]), axis=1)
    big = jnp.iinfo(jnp.int32).max
    key = jnp.where(grp_b, idx, big)
    return lax.sort(key)[: g_cap + 1]


def stage_prefix(codes, pos, mass):
    return _cumsum_prefix(
        jnp.concatenate([mass[:, None], pos * mass[:, None]], axis=1)
    )


f_full = jax.jit(lambda p, m, c: build_source_cells(c, p, m, b, cfg.g, g_cap, lo, size))
f_bnd = jax.jit(stage_bnd)
f_cut = jax.jit(stage_cut)
f_sorts = jax.jit(stage_sorts)
f_pref = jax.jit(stage_prefix)

for name, fn, args in [
    ("bnd_only", f_bnd, (cs,)),
    ("cut_scans", f_cut, (cs,)),
    ("one_sort", f_sorts, (cs,)),
    ("prefix4", f_pref, (cs, ps, ms)),
    ("full", f_full, (ps, ms, cs)),
]:
    out = fn(*args); _sync(out)
    t = time_fn(fn, *args, iters=6, warmup=1)
    print(f"{name:10s} {t['median_ms']:8.2f} ms", flush=True)

# ---- tables sub-breakdown ----
from nbody_tpu.ops.forces import build_bands, build_cell_tables, make_supers
from nbody_tpu.ops.cells import build_source_cells as _bsc

cells = f_full(ps, ms, cs)
supers = make_supers(cells)
from nbody_tpu.ops import forces as _forces
subs = _forces.target_subspheres(ps, cfg.force_tile)
bands = jax.jit(lambda ts, s, ce: _forces.cell_band_lists(ts, s, ce, cfg))(subs, supers, cells)
_sync(bands.sup_cnt)

def tab_gather_only(cells, supers, bands):
    t = build_cell_tables(cells, supers, bands)
    return t.tx.sum()   # force materialization

f_tab2 = jax.jit(tab_gather_only)
_ = f_tab2(cells, supers, bands); _sync(_)
t = time_fn(f_tab2, cells, supers, bands, iters=6, warmup=1)
print(f"{'tables+sum':12s} {t['median_ms']:8.2f} ms", flush=True)

# the [N, D] per-depth scans in isolation, both layouts
from jax import lax as _lax
import jax.numpy as _jnp
N_D = 11
idx = _jnp.arange(ps.shape[0], dtype=_jnp.int32)
bnd_nd = (idx[:, None] % 97 == 0) | (idx[:, None] % (3 + _jnp.arange(N_D)[None, :]) == 0)

def scan_nd(b):
    s = _lax.cummax(_jnp.where(b, idx[:, None], -1), axis=0)
    e = _lax.cummin(_jnp.where(b, idx[:, None] + 1, ps.shape[0] + 1), axis=0, reverse=True)
    return (e - s).sum()

def scan_dn(b):
    bt = b.T
    s = _lax.cummax(_jnp.where(bt, idx[None, :], -1), axis=1)
    e = _lax.cummin(_jnp.where(bt, idx[None, :] + 1, ps.shape[0] + 1), axis=1, reverse=True)
    return (e - s).sum()

f_nd = jax.jit(scan_nd); f_dn = jax.jit(scan_dn)
for nm, f in (("scan[N,D]", f_nd), ("scan[D,N]", f_dn)):
    _ = f(bnd_nd); _sync(_)
    t = time_fn(f, bnd_nd, iters=6, warmup=1)
    print(f"{nm:12s} {t['median_ms']:8.2f} ms", flush=True)
