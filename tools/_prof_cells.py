"""Which part of build_source_cells costs ~120 ms at 1M? (current
sliding-window 63-bit build).  Stages are cumulative prefixes of the real
build so their deltas attribute the cost.

Usage: _prof_cells.py [n]
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import sys
import jax, jax.numpy as jnp
from jax import lax

from nbody_tpu.config import SimConfig
from nbody_tpu.init import make_initial_state
from nbody_tpu.ops import bbox, forces
from nbody_tpu.models.simulation import sort_by_morton
from nbody_tpu.ops import cells as C
from nbody_tpu.utils.profiling import _sync, time_fn

n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
cfg = SimConfig(n=n, check_overflow=False)
st = make_initial_state(cfg)
cs_, perm, lo, size = sort_by_morton(st.pos, cfg)
ps, ms, cs = forces.pad_sorted(st.pos[perm], st.mass[perm], cs_, cfg.force_tile)
b = cfg.force_tile
g_cap = cfg.cell_capacity
c_cap = 8 * g_cap
c2_cap = min(cfg.g2_cap_factor, 8) * c_cap
npad = ps.shape[0]
_I32 = jnp.int32
max_d = C.max_depth_of(cs)


def flags(codes):
    idx = jnp.arange(npad, dtype=_I32)
    lcp = C.adjacent_lcp(codes)
    cut_depth = C._sliding_cut_depth(lcp, b, max_d)
    at_max = cut_depth >= max_d
    first_b = idx == 0
    grp_b = first_b | (lcp < 3 * jnp.minimum(cut_depth, max_d))
    bmax = first_b | (lcp < 3 * max_d)
    st_max = lax.cummax(jnp.where(bmax, idx, -1))
    grp_b = grp_b | (at_max & ((idx - st_max) % b == 0))
    chd_b = grp_b | (lcp < 3 * jnp.minimum(cut_depth + 1, max_d))
    sub = max(b // 8, 1)
    grp_start = lax.cummax(jnp.where(grp_b, idx, -1))
    chd_b = chd_b | (at_max & ((idx - grp_start) % sub == 0))
    g2_b = chd_b | (lcp < 3 * jnp.minimum(cut_depth + 2, max_d))
    sub2 = max(b // 64, 1)
    chd_start = lax.cummax(jnp.where(chd_b, idx, -1))
    g2_b = g2_b | (at_max & ((idx - chd_start) % sub2 == 0))
    return grp_b, chd_b, g2_b, cut_depth


def stage_cut(codes):
    lcp = C.adjacent_lcp(codes)
    return C._sliding_cut_depth(lcp, b, max_d)


def stage_flags(codes):
    return flags(codes)


def stage_ids(codes):
    grp_b, chd_b, g2_b, _ = flags(codes)
    return (jnp.cumsum(grp_b.astype(_I32)), jnp.cumsum(chd_b.astype(_I32)),
            jnp.cumsum(g2_b.astype(_I32)))


def stage_compacts(codes):
    grp_b, chd_b, g2_b, _ = flags(codes)
    idx = jnp.arange(npad, dtype=_I32)
    big = jnp.iinfo(jnp.int32).max

    def compact(f, cap):
        key = jnp.where(f, idx, big)
        skey = lax.sort(key)
        return jnp.minimum(skey[: cap + 1], npad)

    return (compact(grp_b, g_cap), compact(chd_b, c_cap),
            compact(g2_b, c2_cap))


def stage_moments(codes, pos, mass):
    ge, ce, g2e = stage_compacts(codes)
    pmw = C._cumsum_prefix(
        jnp.concatenate([mass[:, None], pos * mass[:, None]], axis=1)
    )

    def seg(first, count):
        fc = jnp.clip(first, 0, npad - 1)
        d = pmw[jnp.clip(first + count, 0, npad)] - pmw[fc]
        return d

    outs = []
    for e in (ge, ce, g2e):
        f = e[:-1]
        c = jnp.clip(e[1:] - f, 0, npad)
        outs.append(seg(f, c))
    return tuple(outs)


def stage_analytic(codes, pos, mass):
    ge, ce, g2e = stage_compacts(codes)
    outs = list(stage_moments(codes, pos, mass))
    _, _, _, cut_depth = flags(codes)
    for e, dd in ((ge, 0), (ce, 1), (g2e, 2)):
        f = e[:-1]
        cnt = jnp.clip(e[1:] - f, 0, npad)
        fc = jnp.clip(f, 0, npad - 1)
        depth = jnp.minimum(cut_depth[fc] + dd, max_d)
        width = size * jnp.exp2(-depth.astype(jnp.float32))
        corner = C.cell_corner(cs[fc], depth, lo, size)
        outs.append((jnp.where((cnt > 0)[:, None], corner, 0.0), width))
    return tuple(outs)


def stage_full(codes, pos, mass):
    return C.build_source_cells(codes, pos, mass, b, cfg.g, g_cap, lo, size,
                                g2_factor=cfg.g2_cap_factor)


def stage_full_skin(codes, pos, mass, drift):
    return C.build_source_cells(codes, pos, mass, b, cfg.g, g_cap, lo, size,
                                drift_sorted=drift, g2_factor=cfg.g2_cap_factor)


drift = jnp.ones((npad,), jnp.float32)
noop = jax.jit(lambda x: x + 1.0)
basev = time_fn(noop, jnp.zeros((8,), jnp.float32), iters=10)["median_ms"]
print(f"[relay] {basev:.1f} ms (subtracted)", flush=True)
for name, fn, args in [
    ("cut_scans", stage_cut, (cs,)),
    ("flags", stage_flags, (cs,)),
    ("ids", stage_ids, (cs,)),
    ("compacts", stage_compacts, (cs,)),
    ("moments", stage_moments, (cs, ps, ms)),
    ("analytic", stage_analytic, (cs, ps, ms)),
    ("full_noskin", stage_full, (cs, ps, ms)),
    ("full_skin", stage_full_skin, (cs, ps, ms, drift)),
]:
    f = jax.jit(fn)
    out = f(*args); _sync(out)
    t = time_fn(f, *args, iters=6, warmup=1)
    print(f"{name:12s} {t['median_ms'] - basev:8.2f} ms", flush=True)
