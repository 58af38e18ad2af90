"""Which stage of cell_band_lists costs ~200 ms at 1M with the
demand-sized caps?  Cumulative stage prefixes of the real classifier.

Usage: _prof_classify.py [n]
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import sys
import jax, jax.numpy as jnp
from jax import lax

from nbody_tpu.config import SimConfig
from nbody_tpu.init import make_initial_state
from nbody_tpu.ops import forces
from nbody_tpu.ops.forces import (
    SUB_FACTOR, _row_compact_one, _row_compact_two, _window_masks, soft_term,
)
from nbody_tpu.models.simulation import sort_by_morton
from nbody_tpu.ops.cells import build_source_cells
from nbody_tpu.ops import bbox as _bbox
from nbody_tpu.utils.profiling import _sync, time_fn

n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
over = {}
for kv in sys.argv[2:]:
    k_, v_ = kv.split("=")
    f_ = SimConfig.__dataclass_fields__[k_].type
    over[k_] = (v_.lower() in ("1", "true")) if "bool" in str(f_) else (
        float(v_) if "float" in str(f_) else int(v_))
cfg = SimConfig(n=n, check_overflow=False, **over)
hot = _os.environ.get("NBODY_HOT_STATE")
if hot:
    from nbody_tpu.utils.io import load_checkpoint
    st, _at = load_checkpoint(hot)
    st = jax.device_put(st)
    print(f"  loaded {hot} (step {_at})", flush=True)
else:
    st = make_initial_state(cfg)
cs_, perm, lo, size = sort_by_morton(st.pos, cfg)
ps, ms, cs = forces.pad_sorted(st.pos[perm], st.mass[perm], cs_, cfg.force_tile)

box_lo, box_size = _bbox.bounding_cube(ps)
cells = jax.jit(lambda c, p, m: build_source_cells(
    c, p, m, cfg.force_tile, cfg.g, cfg.cell_capacity, box_lo, box_size,
    g2_factor=cfg.g2_cap_factor))(cs, ps, ms)
supers = jax.jit(forces.make_supers)(cells)
tgt = jax.jit(lambda p, c: forces.target_subspheres(
    p, cfg.force_tile, codes=c))(ps, cs)
_sync(tgt)

_I32 = jnp.int32


def make_stage(upto: str):
    """A trimmed copy of cell_band_lists running stages up to `upto`."""
    s_cap, mid_cap, cmid_cap, near_cap = (cfg.sup_cap, cfg.mid_cap,
                                          cfg.cmid_cap, cfg.near_cap)
    theta = cfg.theta
    soft = soft_term(cfg)

    def fn(tgt_subs, supers, cells):
        n_sup = supers.com.shape[0]
        g_cap = cells.gmass.shape[0]
        k_cap = 8 * g_cap
        t = tgt_subs.center.shape[0] // SUB_FACTOR
        big = jnp.iinfo(jnp.int32).max // 2 * 2
        half = jnp.float32(0.0)

        cellf = jnp.concatenate(
            [cells.com, cells.diam[:, None], cells.skin[:, None]], axis=1)
        cellf8 = jnp.concatenate(
            [cellf.reshape(n_sup, 8, 5), jnp.zeros((1, 8, 5), jnp.float32)])
        gc_ok = cells.gchild_gmass > 0
        big_f = jnp.float32(3.0e38)
        gc_lo = jnp.min(jnp.where(gc_ok[..., None], cells.gchild_com, big_f), axis=2)
        gc_hi = jnp.max(jnp.where(gc_ok[..., None], cells.gchild_com, -big_f), axis=2)
        kidf = jnp.concatenate(
            [cells.child_com, cells.child_diam[..., None],
             cells.gchild_diam_max[..., None], gc_lo, gc_hi,
             cells.child_gmass[..., None], cells.child_skin[..., None],
             cells.gchild_complete.astype(jnp.float32)[..., None]], axis=-1)
        kidf = jnp.concatenate([kidf, jnp.zeros((1, 8, 14), jnp.float32)])
        fc_flat = jnp.concatenate([
            jnp.stack([cells.child_first.reshape(-1),
                       cells.child_count.reshape(-1)], axis=1),
            jnp.zeros((1, 2), _I32)])

        centers = tgt_subs.center.reshape(t, SUB_FACTOR, 3)
        radii = tgt_subs.radius.reshape(t, SUB_FACTOR)
        per_row = 24 * n_sup + 120 * s_cap + 250 * mid_cap
        chunk = max(8, min(256, (28 << 20) // max(per_row, 1)))
        t_pad = -(-t // chunk) * chunk
        centers = jnp.pad(centers, ((0, t_pad - t), (0, 0), (0, 0)))
        radii = jnp.pad(radii, ((0, t_pad - t), (0, 0)))
        sup_ids = jnp.arange(n_sup, dtype=_I32)[None, :]
        arange8 = jnp.arange(8, dtype=_I32)

        def one_chunk(args):
            ctr, rad = args
            c_rows = ctr.shape[0]
            rad_t = rad + half

            def sub_gap(com, src_skin):
                d = com[:, :, None, :] - ctr[:, None, :, :]
                gap = jnp.sqrt(jnp.sum(d * d, axis=-1)) - rad_t[:, None, :]
                gap = jnp.maximum(jnp.min(gap, axis=-1), 0.0)
                return jnp.maximum(gap - (src_skin + half), 0.0)

            d = supers.com[None, :, None, :] - ctr[:, None, :, :]
            gap = jnp.sqrt(jnp.sum(d * d, axis=-1)) - rad_t[:, None, :]
            ssk = supers.skin[None, :] + half
            gap = jnp.maximum(jnp.maximum(jnp.min(gap, axis=-1), 0.0) - ssk, 0.0)
            dist = jnp.sqrt(gap * gap + soft)
            fail1 = (supers.diam[None, :] + 2.0 * ssk) / dist >= theta
            if upto == "stage1":
                return (jnp.sum(fail1.astype(_I32), axis=1),)
            sup_idx, _ = _row_compact_one(
                jnp.where(fail1, sup_ids, big), big, s_cap)
            if upto == "compact1":
                return (sup_idx[:, 0],)

            sup_c = jnp.minimum(sup_idx, n_sup)
            cand = sup_c[:, :, None] * 8 + arange8[None, None, :]
            cand = jnp.minimum(cand, g_cap).reshape(c_rows, -1)
            f = cellf8[sup_c].reshape(c_rows, -1, 5)
            csk = f[..., 4] + half
            distc = jnp.sqrt(sub_gap(f[..., 0:3], f[..., 4]) ** 2 + soft)
            failc = ((f[..., 3] + 2.0 * csk) / distc >= theta) & (cand < g_cap)
            if upto == "stage2":
                return (jnp.sum(failc.astype(_I32), axis=1),)
            mid_idx, _ = _row_compact_one(
                jnp.where(failc, cand, big), big, mid_cap)
            if upto == "compact2":
                return (mid_idx[:, 0],)

            midc = jnp.minimum(mid_idx, g_cap)
            kf = kidf[midc].reshape(c_rows, mid_cap * 8, 14)
            kid_id = (midc[:, :, None] * 8 + arange8[None, None, :]).reshape(
                c_rows, -1)
            ksk = kf[..., 12] + half
            distk = jnp.sqrt(sub_gap(kf[..., 0:3], kf[..., 12]) ** 2 + soft)
            live = (kf[..., 11] > 0) & (kid_id < k_cap)
            failk = ((kf[..., 3] + 2.0 * ksk) / distk >= theta) & live
            blo = kf[..., 5:8]
            bhi = kf[..., 8:11]
            cl = jnp.clip(ctr[:, None, :, :], blo[:, :, None, :], bhi[:, :, None, :])
            gap_box = jnp.linalg.norm(cl - ctr[:, None, :, :], axis=-1) - rad_t[:, None, :]
            gap_box = jnp.maximum(
                jnp.maximum(jnp.min(gap_box, axis=-1), 0.0) - ksk, 0.0)
            dist_box = jnp.sqrt(gap_box * gap_box + soft)
            cmid_m = (failk & ((kf[..., 4] + 2.0 * ksk) / dist_box < theta)
                      & (kf[..., 13] > 0.5))
            near_m = failk & ~cmid_m
            if upto == "stage3":
                return (jnp.sum(near_m.astype(_I32), axis=1),)
            key_c = jnp.where(cmid_m, kid_id, big)
            key_n = jnp.where(near_m, kid_id + big // 2, big)
            ci, cc_, ni, nc = _row_compact_two(key_c, key_n, big, cmid_cap, near_cap)
            if upto == "compact3":
                return (ni[:, 0],)
            ni_safe = jnp.minimum(ni, k_cap)
            fc = fc_flat[ni_safe]
            sf, scnt = fc[..., 0], fc[..., 1]
            if upto in ("winscan", "winsort"):
                # _window_masks split at its two expensive internals: the
                # 5-operand segmented-OR scan ("winscan") and the final
                # 5-operand pack sort ("winsort" == full windows)
                from nbody_tpu.ops.forces import SPAN_ALIGN, _lowmask
                big2 = jnp.iinfo(jnp.int32).max // 2 * 2
                w = sf // SPAN_ALIGN
                off = lax.rem(sf, SPAN_ALIGN)
                c1 = jnp.minimum(scnt, SPAN_ALIGN - off)
                c2 = scnt - c1
                live1 = scnt > 0
                live2 = c2 > 0
                key1 = jnp.where(live1, w, big2)
                key2 = jnp.where(live2, w + 1, key1)
                end1 = off + c1
                words1 = tuple(
                    jnp.where(live1, _lowmask(end1 - 32 * j) & ~_lowmask(off - 32 * j), 0)
                    for j in range(4))
                words2 = tuple(jnp.where(live2, _lowmask(c2 - 32 * j), 0) for j in range(4))
                rr, kk = sf.shape

                def inter(a, b):
                    return jnp.stack([a, b], axis=-1).reshape(rr, -1)

                key = inter(key1, key2)
                m0, m1, m2, m3 = (inter(a, b) for a, b in zip(words1, words2))
                bnd = jnp.concatenate(
                    [jnp.ones_like(key[:, :1], bool), key[:, 1:] != key[:, :-1]], axis=1)
                rank = jnp.cumsum(bnd.astype(_I32), axis=1) - 1

                def comb(a, b):
                    fa, fb = a[0], b[0]
                    rest = tuple(jnp.where(fb, xb, xa | xb) for xa, xb in zip(a[1:], b[1:]))
                    return (fa | fb,) + rest

                _, m0, m1, m2, m3 = lax.associative_scan(
                    comb, (bnd, m0, m1, m2, m3), axis=1)
                if upto == "winscan":
                    return (m0[:, 0] | m1[:, 0] | m2[:, 0] | m3[:, 0],)
                last = jnp.concatenate(
                    [key[:, :-1] != key[:, 1:], jnp.ones_like(key[:, :1], bool)], axis=1)
                keep = jnp.where(last & (key < big2) & (rank < cfg.win_cap_eff), key, big2)
                keep, m0, m1, m2, m3 = lax.sort((keep, m0, m1, m2, m3), dimension=1,
                                                num_keys=1)
                return (keep[:, 0],)
            wf, wm, win_cnt, kept, dropped = _window_masks(sf, scnt, cfg.win_cap_eff)
            return (win_cnt,)

        res = lax.map(one_chunk, (centers.reshape(-1, chunk, SUB_FACTOR, 3),
                                  radii.reshape(-1, chunk, SUB_FACTOR)))
        return res

    return fn


noop = jax.jit(lambda x: x + 1.0)
base = time_fn(noop, jnp.zeros((8,), jnp.float32), iters=10)["median_ms"]
print(f"[relay] {base:.1f} ms (subtracted); caps sup={cfg.sup_cap} "
      f"mid={cfg.mid_cap} cmid={cfg.cmid_cap} near={cfg.near_cap}", flush=True)
for name in ["stage1", "compact1", "stage2", "compact2", "stage3",
             "compact3", "winscan", "winsort", "windows"]:
    f = jax.jit(make_stage(name))
    out = f(tgt, supers, cells); _sync(out)
    t = time_fn(f, tgt, supers, cells, iters=6, warmup=1)
    print(f"{name:10s} {t['median_ms'] - base:8.2f} ms", flush=True)
