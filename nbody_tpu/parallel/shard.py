"""Multi-chip Barnes-Hut via shard_map over a 1-D device mesh.

The reference is strictly single-GPU (SURVEY.md §2.3): no NCCL/MPI, no
multi-device story of any kind.  This module is the new capability that
lets the same physics scale across a TPU slice (BASELINE config 5:
N=4M over v5e-8).

Decomposition (the "config-5" design, SURVEY.md §2.3 row SP/CP):

  * particles live in Morton-SORTED SLABS: chip d owns the contiguous
    range [d*N/D, (d+1)*N/D) of the global sorted order, so each chip's
    targets are spatially compact; slabs STAY RESIDENT across rebuilds —
    the full per-particle state never crosses the wire;
  * per REBUILD (once per band-reuse cycle): the only all_gathers are
    positions (12 B/particle — also what every step's near band needs),
    masses (4 B) and the (|v|, |a|) magnitudes (8 B) that set the skin
    envelopes.  Every chip then derives the same global Morton
    permutation (replicated O(N) sort — ~1.6 ms/M) and re-slabs its OWN
    velocity/acceleration/id rows via a fixed-size neighbor halo
    exchange (Morton slabs drift by only a few ranks per cycle); a
    replicated scalar predicate falls back to a full gather in the rare
    case a slab moved past the halo, so correctness never depends on the
    drift bound.  The adaptive source CELLS are built OWNER-COMPUTES
    over slab + 4b halo windows (O(N/D) compute,
    ops/cells.build_source_cells_window) and stitched into the
    replicated global cell list by an O(cells) summary all_gather
    (_stitch_cells); super/super-super monopoles regroup from those
    (O(cells));
  * CLASSIFICATION (band lists + tables — the dominant build cost) runs
    ONLY for the chip's own T/D target blocks: per-chip band shapes are
    statically T/D (asserted at trace time below);
  * per STEP, the only communication is a FIXED 2h-row live-position
    ppermute halo (h = slab/near_halo_div — near windows are Morton-
    local to each slab) feeding the exact near-band P2P, with a
    replicated per-cycle reach predicate falling back to a full
    all_gather when any frozen window points past the halo; the far/mid
    sweeps read the frozen replicated monopoles (KBs) and the chip's own
    tables;
  * integration is slab-local.

Per-chip per-step compute is therefore ~1/D of the sweep work AND ~1/D
of the cell-build work; the replicated residue is the per-cycle Morton
sort only (O(N log N) with a tiny constant — measured 1.6 ms/M,
amortized over the K steps of a cycle).

Two production runners mirror the single-chip ones step for step:
`make_sharded_runner` (fixed-K cycles, models/simulation.make_cycle_runner
semantics) and `make_sharded_adaptive_runner` (width-capped skin
envelopes + validity horizon, make_adaptive_runner semantics — the
physics-gated path; see PERF.md round-2 for why fixed-K reuse fails the
kilostep gate in the late-time dense core).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from nbody_tpu.config import SimConfig
from nbody_tpu.state import ParticleState
from nbody_tpu.ops import bbox, morton, forces, integrate as integ
from nbody_tpu.models.simulation import (
    sort_by_morton, drift_bound, adaptive_drift, validity_horizon,
    hold_predict_pos,
)

AXIS = "bodies"


def make_mesh(n_devices: Optional[int] = None) -> Mesh:
    import numpy as np

    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (AXIS,))


def _gather(x):
    g = jax.lax.all_gather(x, AXIS)
    return g.reshape((-1,) + g.shape[2:])


_SHARD_CELL_SKEW = 4   # per-shard owned-cell headroom over perfect balance


def _shard_cell_cap(cfg: SimConfig, d: int) -> int:
    """Per-shard OWNED-cell capacity for the windowed build:
    cell_capacity/D with _SHARD_CELL_SKEW headroom (the contracted core
    concentrates small cells in a few slabs), rounded up to 64, never
    above the global cap.  Per-shard overflow is psum'd into the global
    cells.overflow, so a skew bust is as loud as a global cap bust."""
    cap = -(-cfg.cell_capacity * _SHARD_CELL_SKEW // (64 * d)) * 64
    return min(cfg.cell_capacity, max(64, cap))


def _stitch_cells(sc, g_cap: int, cap_s: int, d: int):
    """all_gather the per-shard OWNED cell rows (packed live prefixes)
    and compact them into the global SourceCells every chip needs for
    the far/mid sweeps and classification.

    Shards' cells concatenated in shard order ARE the global cell list
    (build_source_cells_window contract: cells are disjoint runs ordered
    by first particle), so compaction is D ascending
    dynamic_update_slice block writes at exclusive-prefix offsets: shard
    i's pad spill past its live prefix is overwritten by shard i+1's
    block, and the LAST shard's spill lands at rows >= n_tot where its
    pad values ARE the global build's pad convention (zeros; +/-big for
    lo/hi; False for gchild_complete).  Wire cost is O(cells) rows
    (~1.4 KB each), not O(N) positions — SURVEY.md §7 step 8's
    "all-gather per-shard top-tree summaries"."""
    from nbody_tpu.ops.cells import SourceCells

    n_i = jax.lax.all_gather(sc.n_cells, AXIS)            # [D]
    off = jnp.cumsum(n_i) - n_i                           # exclusive
    n_tot = jnp.sum(n_i)
    ext = g_cap + cap_s                                   # spill room

    big_f = jnp.float32(3.0e38)
    pads = {"lo": big_f, "hi": -big_f}

    def stitch(name):
        field = getattr(sc, name)
        g = jax.lax.all_gather(field, AXIS)               # [D, cap_s, ...]
        pad = pads.get(name, False if field.dtype == jnp.bool_ else 0)
        out = jnp.full((ext,) + field.shape[1:], pad, field.dtype)
        for i in range(d):
            out = jax.lax.dynamic_update_slice_in_dim(out, g[i], off[i], 0)
        return out[:g_cap]

    row_fields = [f for f in SourceCells._fields
                  if f not in ("n_cells", "n_child", "n_g2",
                               "overflow", "overflow_g2")]
    stitched = {f: stitch(f) for f in row_fields}
    any_over = jax.lax.psum(sc.overflow.astype(jnp.int32), AXIS) > 0
    any_over_g2 = jax.lax.psum(sc.overflow_g2.astype(jnp.int32), AXIS) > 0
    return SourceCells(
        **stitched,
        n_cells=jnp.minimum(n_tot, g_cap),
        n_child=jax.lax.psum(sc.n_child, AXIS),
        n_g2=jax.lax.psum(sc.n_g2, AXIS),
        overflow=any_over | (n_tot > g_cap),
        overflow_g2=any_over_g2,
    )


def _cells_sharded(codes_s, pos_s, mass_s, cfg: SimConfig, box_lo,
                   box_size, drift=None):
    """OWNER-COMPUTES global SourceCells from the sorted global arrays:
    windowed per-shard build (ops/cells.build_source_cells_window —
    O(N/D) compute) + the O(cells) summary stitch (_stitch_cells).

    `box_lo`/`box_size` are passed in (NOT derived from pos_s) so a
    moment refresh at a FROZEN cut can rebuild moments from LIVE
    positions against the rebuild-time quantization box — the exact
    sharded analog of forces.refresh_farmid's frozen-box contract.
    Returns (cells, codes_own)."""
    from nbody_tpu.ops.cells import (
        build_source_cells_window, last_bmax_boundary,
    )

    d = jax.lax.axis_size(AXIS)
    me = jax.lax.axis_index(AXIS)
    n_pad = pos_s.shape[0]
    m = n_pad // d                        # slab particles
    b = cfg.force_tile

    halo = 4 * b
    cap_s = _shard_cell_cap(cfg, d)
    start = me * m

    def win(x):
        # slab + 4b halo window in EDGE-PADDED coords (never clamps, so
        # the window stays exactly centered on the owned range)
        left = jnp.broadcast_to(x[:1], (halo,) + x.shape[1:])
        right = jnp.broadcast_to(x[-1:], (halo,) + x.shape[1:])
        return jax.lax.dynamic_slice_in_dim(
            jnp.concatenate([left, x, right]), start, m + 2 * halo, 0)

    # cross-shard cut carry: last max-depth run boundary BEFORE my slab
    codes_own = jax.lax.dynamic_slice_in_dim(codes_s, start, m, 0)
    left_code = codes_s[jnp.maximum(start - 1, 0)]
    my_last = last_bmax_boundary(codes_own, left_code, start)
    lasts = jax.lax.all_gather(my_last, AXIS)             # [D] scalars
    carry = jnp.max(jnp.where(
        jnp.arange(d, dtype=jnp.int32) < me, lasts, jnp.int32(-1)))

    shard_cells = build_source_cells_window(
        win(codes_s), win(pos_s), win(mass_s), b, cfg.g, cap_s,
        start, m, n_pad, carry, box_lo, box_size,
        drift_sorted=None if drift is None else win(drift),
        g2_factor=cfg.g2_cap_factor,
    )
    # config-5 invariant: per-chip cell-build output is OWNED cells only
    # (capacity cell_capacity*skew/D), never the global list
    assert shard_cells.first.shape[0] == cap_s
    return _stitch_cells(shard_cells, cfg.cell_capacity, cap_s, d), codes_own


def _classify_slab(pos_s, mass_s, codes_s, cfg: SimConfig, drift=None):
    """OWNER-COMPUTES cells + MY SLAB's classification.

    pos_s/mass_s/codes_s/drift are the GLOBAL sorted (padded) arrays;
    returns (cells, supers, bands_slab, tables_slab, my_pos).

    The adaptive-cut cell build runs over MY slab + a 4b halo window
    only (_cells_sharded — O(N/D) compute, vs the round-3 replicated
    O(N) build); per-chip classification work is statically T/D —
    asserted below.
    """
    d = jax.lax.axis_size(AXIS)
    me = jax.lax.axis_index(AXIS)
    n_pad = pos_s.shape[0]
    m = n_pad // d                        # slab particles
    b = cfg.force_tile
    start = me * m

    box_lo, box_size = bbox.bounding_cube(pos_s)
    cells, codes_own = _cells_sharded(
        codes_s, pos_s, mass_s, cfg, box_lo, box_size, drift=drift
    )
    supers = forces.make_supers(cells)
    ss = forces.make_ss(supers, cfg)

    my_pos = jax.lax.dynamic_slice_in_dim(pos_s, start, m, 0)
    my_drift = (
        None if drift is None
        else jax.lax.dynamic_slice_in_dim(drift, start, m, 0)
    )
    tgt_subs = forces.target_subspheres(my_pos, b, drift=my_drift,
                                        codes=codes_own)
    bands = forces.cell_band_lists(tgt_subs, ss, supers, cells, cfg)
    tables = forces.build_cell_tables(cells, supers, ss, bands)
    # config-5 invariant: classification output is the LOCAL slab only
    assert bands.sup_idx.shape[0] == m // b, (
        "per-chip classification must cover exactly T/D target blocks"
    )
    assert tables.tx.shape[0] == m // b
    # the far-sweep level (super-supers) rides in the `supers` slot —
    # exactly what apply_farmid consumes (forces.build_bands contract)
    return cells, ss, bands, tables, my_pos


def _near_halo_rows(m: int, cfg: SimConfig) -> int:
    """Static halo width (rows) for the per-step near-band exchange:
    m // cfg.near_halo_div, at least one span, rounded UP to a span
    multiple so rebased window starts stay 128-aligned (the Pallas near
    kernel's HBM DMA alignment invariant), capped at the slab size."""
    h = max(forces.SPAN_ALIGN, m // max(1, cfg.near_halo_div))
    h = -(-h // forces.SPAN_ALIGN) * forces.SPAN_ALIGN
    return min(h, m)


def _halo_ext(x, h: int):
    """[m, ...] slab rows -> [m + 2h, ...] extended with the left
    neighbor's last h rows and the right neighbor's first h rows (one
    fixed-size ppermute pair).  Ring wrap-around rows at the global ends
    are garbage by construction but are never addressed: global row i
    maps to ext row i - (me*m - h), and chip 0's windows have i >= 0
    (ext rows >= h) while the last chip's end at i < N (ext rows
    <= m + h)."""
    d = jax.lax.axis_size(AXIS)
    fwd = [(i, (i + 1) % d) for i in range(d)]
    bwd = [(i, (i - 1) % d) for i in range(d)]
    left = jax.lax.ppermute(x[x.shape[0] - h:], AXIS, fwd)
    right = jax.lax.ppermute(x[:h], AXIS, bwd)
    return jnp.concatenate([left, x, right], axis=0)


def _near_reach_ok(bands, m, h: int):
    """Replicated predicate: every chip's live near windows lie inside
    its [me*m - h, (me+1)*m + h) halo extent, so the per-step near band
    can run on the fixed-traffic ppermute path.  Frozen per cycle (the
    windows are part of the frozen band structure); the full-gather
    fallback keeps correctness independent of the halo size."""
    me = jax.lax.axis_index(AXIS)
    lane = jnp.arange(bands.win_first.shape[1], dtype=jnp.int32)[None, :]
    live = lane < bands.win_cnt[:, None]
    wf = bands.win_first
    ok = (wf >= me * m - h) & (wf + forces.SPAN_ALIGN <= (me + 1) * m + h)
    n_out = jnp.sum((live & ~ok).astype(jnp.int32))
    return jax.lax.psum(n_out, AXIS) == 0


_I32_INF = jnp.int32(2**31 - 1)


def _near_fetch_plan(bands, m: int, h: int, cfg: SimConfig):
    """Per-cycle (frozen) plan for the window-granular near exchange.

    The disk galaxy's dense core sits at the cloud centroid — the seam
    of all eight top-level Morton octants — so core targets' near
    windows reference rank-DISTANT rows that no contiguous halo can
    cover (test_shard.test_near_halo_reach_predicate_detects_seams
    measured reach ~3.6 slabs of 8).  Instead of falling back to the
    O(N) live-position all_gather, each chip lists the DISTINCT
    out-of-halo SPAN_ALIGN-row windows its frozen band structure
    references (win_first is frozen per cycle) and fetches exactly
    those rows per step via a fixed-size all_to_all (_fetch_windows).

    Returns (ok, starts_srv, wf_remap):
      ok        — replicated predicate: every chip's distinct
                  out-of-halo window count fits cfg.near_fetch_cap
                  (the all_gather fallback otherwise);
      starts_srv— [F] my sorted distinct out-of-halo window starts
                  (global sorted rows; unused slots point at my own
                  slab so served rows are always in range), or None
                  when the cap is 0 (halo-only mode);
      wf_remap  — [T_loc, win_cap] win_first rebased into the per-step
                  source array concat([halo_ext(p), fetched windows]):
                  in-halo windows -> wf - (me*m - h), fetched windows
                  -> m + 2h + SPAN_ALIGN * slot.
    """
    me = jax.lax.axis_index(AXIS)
    lane = jnp.arange(bands.win_first.shape[1], dtype=jnp.int32)[None, :]
    live = lane < bands.win_cnt[:, None]
    wf = bands.win_first
    base = me * m - h
    in_halo = (wf >= base) & (wf + forces.SPAN_ALIGN <= (me + 1) * m + h)
    remap_halo = jnp.maximum(wf - base, 0)
    f_cap = cfg.near_fetch_cap
    if f_cap == 0:
        n_out = jnp.sum((live & ~in_halo).astype(jnp.int32))
        ok = jax.lax.psum(n_out, AXIS) == 0
        return ok, None, remap_halo

    # distinct out-of-halo starts, ascending, first f_cap kept
    flat = jnp.where(live & ~in_halo, wf, _I32_INF).reshape(-1)
    s = jnp.sort(flat)
    uniq = jnp.concatenate(
        [jnp.ones((1,), jnp.bool_), s[1:] != s[:-1]]
    ) & (s != _I32_INF)
    pos = jnp.cumsum(uniq.astype(jnp.int32)) - 1
    count = jnp.sum(uniq.astype(jnp.int32))
    buf = jnp.full((f_cap + 1,), _I32_INF, jnp.int32)
    idx = jnp.where(uniq & (pos < f_cap), pos, f_cap)   # overflow -> slot F
    starts = buf.at[idx].set(jnp.where(uniq, s, _I32_INF),
                             mode="drop")[:f_cap]
    # every chip must agree (the cond below the rebuild is replicated)
    ok = jax.lax.psum((count > f_cap).astype(jnp.int32), AXIS) == 0
    # remap out-of-halo windows into the fetch region (exact match by
    # construction whenever ok holds; clipped garbage otherwise — unused
    # because the fallback fires)
    fi = jnp.clip(jnp.searchsorted(starts, wf).astype(jnp.int32),
                  0, f_cap - 1)
    remap = jnp.where(in_halo | ~live, remap_halo,
                      m + 2 * h + forces.SPAN_ALIGN * fi)
    # unused request slots point at my own slab (always-valid rows)
    starts_srv = jnp.where(starts == _I32_INF, me * m, starts)
    return ok, starts_srv, remap


def _fetch_windows(x, reqs_g, m: int):
    """Serve + fetch one round of window rows: `reqs_g` [D, F] holds every
    chip's requested window starts (global sorted rows, SPAN_ALIGN-
    aligned).  Each chip extracts, for every (peer, slot), the overlap of
    the requested 128-row window with its own slab (zeros elsewhere — a
    window may straddle a slab boundary when m % SPAN_ALIGN != 0), then a
    fixed-size all_to_all routes block i to chip i and the per-chip
    contributions are summed (each global row has exactly one owner).
    Returns [F * SPAN_ALIGN, ...]: the rows of MY requested windows.
    Wire cost: D * F * SPAN_ALIGN rows each way, independent of N."""
    me = jax.lax.axis_index(AXIS)
    span = forces.SPAN_ALIGN
    rows = reqs_g[:, :, None] + jnp.arange(span, dtype=jnp.int32)  # [D,F,S]
    loc = rows - me * m
    valid = (loc >= 0) & (loc < m)
    g = x[jnp.clip(loc, 0, m - 1)]
    mask = valid if x.ndim == 1 else valid[..., None]
    g = jnp.where(mask, g, 0)
    recv = jax.lax.all_to_all(g, AXIS, split_axis=0, concat_axis=0,
                              tiled=True)                      # [D, F, S, ...]
    return jnp.sum(recv, axis=0).reshape((-1,) + x.shape[1:])


def _reslab(perm, arrs, h: int):
    """Re-slab the slab-resident `arrs` (each [m, ...] rows of the OLD
    global sorted order) into the NEW order: returns rows
    perm[me*m : (me+1)*m] of each array.

    Fast path (fixed traffic): a 2h-row neighbor halo exchange — chip d
    receives its left neighbor's last h rows and its right neighbor's
    first h rows, then gathers locally.  Morton slabs drift by only a
    few ranks per cycle, so the needed old rows almost always lie inside
    [me*m - h, (me+1)*m + h).  A REPLICATED scalar predicate (psum of
    out-of-range counts) selects a full-gather fallback otherwise, so
    correctness never depends on the halo size.
    """
    d = jax.lax.axis_size(AXIS)
    me = jax.lax.axis_index(AXIS)
    m = arrs[0].shape[0]
    start = me * m
    need = jax.lax.dynamic_slice_in_dim(perm, start, m, 0)   # old global idx
    base = start - h
    off = need - base
    n_out = jnp.sum((off < 0) | (off >= m + 2 * h))
    # replicated predicate: every chip agrees on fast vs fallback
    any_out = jax.lax.psum(n_out, AXIS) > 0

    fwd = [(i, (i + 1) % d) for i in range(d)]   # data flows left -> right
    bwd = [(i, (i - 1) % d) for i in range(d)]   # data flows right -> left

    def fast(arrs):
        out = []
        for x in arrs:
            left = jax.lax.ppermute(x[m - h:], AXIS, fwd)
            right = jax.lax.ppermute(x[:h], AXIS, bwd)
            ext = jnp.concatenate([left, x, right], axis=0)
            out.append(ext[jnp.clip(off, 0, m + 2 * h - 1)])
        return tuple(out)

    def slow(arrs):
        return tuple(_gather(x)[need] for x in arrs)

    return jax.lax.cond(any_out, slow, fast, tuple(arrs)), any_out


def _rebuild_sharded(pos, vel, mass, acc, orig, cfg: SimConfig, k: int,
                     adaptive: bool, k_env=None, afm=None):
    """One sharded band rebuild.  Inputs are slab rows of the current
    global sorted order; returns the re-slabbed state (new sorted order),
    the frozen band structures for MY slab, the per-cycle near-exchange
    context (replicated sorted masses for the fallback, the fixed-width
    mass halo, the reach predicate), the (validity horizon, next
    envelope horizon) pair (adaptive; `k_env` sizes this rebuild's skins
    — the single-chip runner's self-tuned envelope,
    models/simulation.make_adaptive_runner) or (k, k), the re-slabbed
    held far+mid acceleration (`afm` — rides `_reslab` exactly like
    vel/acc when cfg.farmid_span_rebuilds carries it across rebuilds;
    None in, None out), and the frozen refresh context rctx = (global
    sorted codes, drift bounds, box lo, box size) that
    _refresh_farmid_slab needs when cfg.refresh_moments recomputes
    moments at this build's frozen cut (None unless that flag is set —
    it is replicated O(N) carry bytes).

    Wire traffic: all_gather of pos (12 B/particle), mass (4 B) and
    (|v|, |a|) (8 B) — never the full 64 B/particle state — plus the
    fixed 2h-row halo exchange of (vel, acc, orig[, afm]) in `_reslab`.
    """
    d = jax.lax.axis_size(AXIS)
    me = jax.lax.axis_index(AXIS)
    m = pos.shape[0]

    pos_g = _gather(pos)
    mass_g = _gather(mass)
    vam_g = _gather(jnp.stack(
        [jnp.sqrt(jnp.sum(vel * vel, axis=1)),
         jnp.sqrt(jnp.sum(acc * acc, axis=1))], axis=1,
    ))
    codes_s, perm, box_lo, box_size = sort_by_morton(pos_g, cfg)
    pos_s = pos_g[perm]
    mass_s = mass_g[perm]
    v = vam_g[perm, 0]
    a = vam_g[perm, 1]
    if adaptive:
        ke_i = (jnp.int32(cfg.rebuild_every) if k_env is None else k_env)
        ke = ke_i.astype(jnp.float32)
        drift = adaptive_drift(v, a, codes_s, box_size, cfg, k=ke)
        s_valid = validity_horizon(v, a, drift, cfg)
        k_next = jnp.clip(2 * s_valid, 1, cfg.rebuild_every)
    else:
        drift = drift_bound(v, a, cfg, k)
        s_valid = jnp.int32(k)
        k_next = jnp.int32(k)

    # re-slab the heavy per-particle rows (vel, acc, orig[, afm]) locally
    h = max(cfg.force_tile, m // 4)
    h = min(h, m)
    arrs = (vel, acc, orig) if afm is None else (vel, acc, orig, afm)
    reslabbed, _ = _reslab(perm, arrs, h)
    my_vel, my_acc, my_orig = reslabbed[:3]
    my_afm = reslabbed[3] if afm is not None else None

    cells, supers, bands, tables, my_pos = _classify_slab(
        pos_s, mass_s, codes_s, cfg, drift=drift
    )
    if adaptive:
        # ENVELOPE FEEDBACK (single-chip twin in models/simulation.py):
        # bands are slab-local, so the overflow predicate is psum'd — a
        # REPLICATED scalar keeps every chip's envelope horizon and
        # rebuild countdown in lockstep
        over_l = (bands.ss_overflow | bands.sup_overflow
                  | bands.mid_overflow | bands.cmid_overflow
                  | bands.near_overflow)
        over_g = jax.lax.psum(over_l.astype(jnp.int32), AXIS) > 0
        k_next = jnp.where(over_g, jnp.maximum(ke_i // 2, 1), k_next)
    start = me * m
    my_mass = jax.lax.dynamic_slice_in_dim(mass_s, start, m, 0)
    # per-step near-band exchange context (frozen for the cycle): the
    # fixed-width mass halo + the replicated reach predicate selecting
    # the ppermute fast path over the O(N) live-position all_gather
    h_near = _near_halo_rows(m, cfg)
    fetch_ok, starts_srv, wf_remap = _near_fetch_plan(bands, m, h_near, cfg)
    mass_src = _halo_ext(my_mass, h_near)
    if starts_srv is None:
        reqs_g = None
    else:
        # every chip's request list, frozen for the cycle; the frozen
        # mass rows of the fetched windows ride along once
        reqs_g = jax.lax.all_gather(starts_srv, AXIS)          # [D, F]
        mass_src = jnp.concatenate(
            [mass_src, _fetch_windows(my_mass, reqs_g, m)])
    rctx = ((codes_s, drift, box_lo, box_size)
            if cfg.refresh_moments else None)
    return (
        (my_pos, my_vel, my_mass, my_acc, my_orig),
        (supers, bands, tables),
        (mass_s, mass_src, fetch_ok, reqs_g, wf_remap),
        (s_valid, k_next),
        my_afm,
        rctx,
    )


def _local_bh_step(pos, vel, mass, acc, cfg: SimConfig):
    """shard_map body for the single-step path: args are LOCAL slabs of
    the ORIGINAL particle order [N/D, ...].

    Sort + cells are replicated (cheap O(N) scans); classification,
    tables, all three sweeps, and integration cover only this chip's
    slab of the sorted order.
    """
    pos_g = _gather(pos)
    mass_g = _gather(mass)

    codes_s, perm, _, _ = sort_by_morton(pos_g, cfg)
    pos_s = pos_g[perm]
    mass_s = mass_g[perm]
    ps, ms, cs = forces.pad_sorted(pos_s, mass_s, codes_s, cfg.force_tile)

    d = jax.lax.axis_size(AXIS)
    me = jax.lax.axis_index(AXIS)
    n_total = pos_g.shape[0]
    n_local = n_total // d

    cells, supers, bands, tables, my_pos = _classify_slab(ps, ms, cs, cfg)
    acc_slab = forces.apply_bands(
        my_pos, None, supers, bands, tables, cfg,
        src_pos=ps, src_mass=ms,
    )

    # Re-assemble sorted acc and route back to original sharded order.
    acc_s = _gather(acc_slab)[: n_total]
    acc_orig = jnp.zeros_like(acc_s).at[perm].set(acc_s)
    my_acc = jax.lax.dynamic_slice_in_dim(acc_orig, me * n_local, n_local, 0)

    state_l = ParticleState(pos=pos, vel=vel, mass=mass, acc=acc)
    new = integ.integrate(state_l, my_acc, cfg)
    return new.pos, new.vel, new.mass, new.acc


def make_sharded_step(cfg: SimConfig, mesh: Mesh):
    """Jitted multi-chip step: ParticleState sharded along N -> same.
    Requires n % (n_devices * force_tile) == 0 (use make_sharded_runner
    for arbitrary n — it pads)."""
    d = mesh.devices.size
    if cfg.n % (d * cfg.force_tile):
        raise ValueError(
            f"n={cfg.n} must be a multiple of n_devices*force_tile="
            f"{d * cfg.force_tile} for the sharded step; "
            "make_sharded_runner handles arbitrary n by padding"
        )

    fn = shard_map(
        functools.partial(_local_bh_step, cfg=cfg),
        mesh=mesh,
        in_specs=(P(AXIS), P(AXIS), P(AXIS), P(AXIS)),
        out_specs=(P(AXIS), P(AXIS), P(AXIS), P(AXIS)),
        check_vma=False,
    )

    @jax.jit
    def step(state: ParticleState) -> ParticleState:
        pos, vel, mass, acc = fn(state.pos, state.vel, state.mass, state.acc)
        return ParticleState(pos=pos, vel=vel, mass=mass, acc=acc)

    return step


# ---------------------------------------------------------------------------
# Sharded band-reuse runners (the production multi-chip paths)
# ---------------------------------------------------------------------------


def _farmid_slab(p_mid, supers, tables, cfg):
    return forces.apply_farmid(p_mid, supers, tables, cfg)


def _refresh_farmid_slab(p_mid, my_pos_live, mass_s, rctx, bands, cfg):
    """Sharded moment refresh (cfg.refresh_moments twin of
    forces.refresh_farmid): recompute every source moment from LIVE
    positions over the FROZEN cut (owner-computes windowed cell build
    against the rebuild-time quantization box + O(cells) stitch),
    regather MY slab's tables against the frozen classification, and
    evaluate far+mid at the midpoint target positions.

    Wire cost per refresh: one live-position all_gather (12 B/particle —
    the same traffic one slow-path near step pays) + the O(cells)
    stitch; compute is O(N/D) cells + O(T/D) table gathers."""
    codes_s, drift, box_lo, box_size = rctx
    pos_live = _gather(my_pos_live)
    cells_r, _ = _cells_sharded(
        codes_s, pos_live, mass_s, cfg, box_lo, box_size, drift=drift
    )
    supers_r = forces.make_supers(cells_r)
    ss_r = forces.make_ss(supers_r, cfg)
    tables_r = forces.build_cell_tables(cells_r, supers_r, ss_r, bands)
    return forces.apply_farmid(p_mid, ss_r, tables_r, cfg)


def _near_step(p, v_, my_mass, glob, bands, afm, cfg):
    """One integration step: slab-local far+mid (held, `afm`) + live
    near band.  Per-step communication is a FIXED 2h-row position
    ppermute (near windows are mostly Morton-local to the slab) plus a
    fixed-size all_to_all window fetch for the rank-scattered octant-
    seam windows (_near_fetch_plan/_fetch_windows) when the cycle's
    fetch plan holds — O(N/near_halo_div + fetch_cap*128), not O(N) —
    with the live-position all_gather as the replicated fallback."""
    mass_s, mass_src, near_fast, reqs_g, wf_remap = glob
    m = p.shape[0]
    h = _near_halo_rows(m, cfg)

    def fast(p):
        p_src = _halo_ext(p, h)
        if reqs_g is not None:
            p_src = jnp.concatenate([p_src, _fetch_windows(p, reqs_g, m)])
        bands_l = bands._replace(win_first=wf_remap)
        return forces.apply_near(p, p_src, mass_src, bands_l, cfg)

    def slow(p):
        return forces.apply_near(p, _gather(p), mass_s, bands, cfg)

    a_ = afm + jax.lax.cond(near_fast, fast, slow, p)
    st = integ.integrate(
        ParticleState(pos=p, vel=v_, mass=my_mass, acc=a_), a_, cfg
    )
    return st.pos, st.vel, a_


def _sharded_cycles_body(pos, vel, mass, acc, orig, cfg: SimConfig,
                         n_cycles: int, k: int):
    """shard_map body advancing local slabs by n_cycles * k steps
    (fixed-K reuse — make_cycle_runner semantics).

    Slabs are in the GLOBAL SORTED ORDER of the latest rebuild; `orig`
    maps slab rows to original particle ids (pad rows -> n).  Each cycle:
    one o(N)-traffic rebuild (_rebuild_sharded), then k steps whose only
    communication is the live position all_gather for the near band.
    """

    def cycle(carry, _):
        pos, vel, mass, acc, orig = carry
        (slab, (supers, bands, tables), glob, _sk, _afm, _rctx) = (
            _rebuild_sharded(pos, vel, mass, acc, orig, cfg, k,
                             adaptive=False)
        )
        my_pos, my_vel, my_mass, my_acc, my_orig = slab

        # ---- k steps: only LIVE POSITIONS cross chips (near band) ----
        # with cfg.hold_farmid = R > 1, the smooth slab-local far+mid
        # component is additionally held for R steps (r-RESPA split,
        # models/simulation.py) — it involves no communication either way
        r = max(1, cfg.hold_farmid)
        if k % r:
            r = 1

        def subcycle(c2, _):
            p0, v0, a0 = c2
            # held-refresh target sampling per cfg.hold_predict (twin of
            # models/simulation.py hold_predict_pos)
            tau = 0.5 * (r - 1) * cfg.dt
            p_mid = hold_predict_pos(p0, v0, a0, tau, cfg)
            afm = _farmid_slab(p_mid, supers, tables, cfg)

            def inner(c3, _):
                p, v_, _ = c3
                return _near_step(p, v_, my_mass, glob, bands, afm, cfg), None

            return jax.lax.scan(inner, (p0, v0, a0), None, length=r)

        (my_pos2, my_vel2, my_acc2), _ = jax.lax.scan(
            subcycle, (my_pos, my_vel, my_acc), None, length=k // r
        )
        return (my_pos2, my_vel2, my_mass, my_acc2, my_orig), None

    carry = (pos, vel, mass, acc, orig)
    carry, _ = jax.lax.scan(cycle, carry, None, length=n_cycles)
    return carry


def _sharded_adaptive_body(pos, vel, mass, acc, orig, cfg: SimConfig,
                           n_steps: int):
    """shard_map body advancing local slabs by n_steps with ADAPTIVE
    band rebuilds — the sharded twin of make_adaptive_runner: width-
    capped skin envelopes, a per-rebuild validity horizon (replicated —
    computed from the gathered (|v|, |a|) arrays, so every chip counts
    down in lockstep), graceful degradation to per-step rebuilds in the
    hot core, and the far+mid r-RESPA hold refreshed on rebuild or every
    cfg.hold_farmid steps.

    The SHIPPING integrator options are supported exactly as in the
    single-chip twin: with cfg.farmid_span_rebuilds the held far+mid
    rides the rebuild's _reslab (so only AGE refreshes it -- the hold
    engages even at horizon-1 hot states), and with cfg.refresh_moments
    an age refresh recomputes every source moment from live positions at
    the frozen cut (_refresh_farmid_slab)."""
    r = max(1, cfg.hold_farmid)
    span = cfg.farmid_span_rebuilds
    span_dyn = span and cfg.span_age_mult > 0
    moments = cfg.refresh_moments

    def _r_eff_of(s_valid):
        return jnp.clip(cfg.span_age_mult * s_valid, 1, r).astype(jnp.int32)

    built0 = _rebuild_sharded(pos, vel, mass, acc, orig, cfg,
                              cfg.rebuild_every, adaptive=True)
    slab0, frozen0, glob0, (s_valid0, k_env0), _a0, rctx0 = built0
    if span:
        # single-chip twin (make_adaptive_runner): the held afm starts
        # at zero with age r, so the FIRST step refreshes it
        afm0 = jnp.zeros_like(slab0[0])
        age0 = jnp.int32(r)
    else:
        # held-refresh target sampling (twin of models/simulation.py)
        tau0 = 0.5 * (r - 1) * cfg.dt
        afm0 = _farmid_slab(
            hold_predict_pos(slab0[0], slab0[1], slab0[3], tau0, cfg),
            frozen0[0], frozen0[2], cfg)
        age0 = jnp.int32(0)
    carry0 = (jnp.int32(0), s_valid0, age0, jnp.int32(1), k_env0,
              afm0, slab0, frozen0, glob0, rctx0)
    if span_dyn:
        carry0 = carry0 + (_r_eff_of(s_valid0),)

    def cond_fn(s):
        return s[0] < n_steps

    def body(s):
        i, left, afm_age, n_rb, k_env, afm, slab, frozen, glob, rctx = s[:10]
        r_eff = s[10] if span_dyn else jnp.int32(r)

        trig = left <= 0

        def do_rebuild(args):
            slab, frozen, glob, k_env, afm, rctx = args
            new_slab, new_frozen, new_glob, sk, new_afm, new_rctx = (
                _rebuild_sharded(*slab, cfg, cfg.rebuild_every,
                                 adaptive=True, k_env=k_env,
                                 afm=afm if span else None)
            )
            if not span:
                new_afm = afm   # dead rows: trig forces a refresh below
            return (new_slab, new_frozen, new_glob, new_afm, new_rctx), sk

        def no_rebuild(args):
            slab, frozen, glob, k_env, afm, rctx = args
            return (slab, frozen, glob, afm, rctx), (jnp.int32(0), k_env)

        (slab, frozen, glob, afm, rctx), (s_new, k_env) = jax.lax.cond(
            trig, do_rebuild, no_rebuild,
            (slab, frozen, glob, k_env, afm, rctx),
        )
        left = jnp.where(trig, s_new, left)
        if span_dyn:
            # horizon-tied hold limit, recomputed per rebuild
            r_eff = jnp.where(trig, _r_eff_of(s_new), r_eff)

        my_pos, my_vel, my_mass, my_acc, my_orig = slab
        supers, bands, tables = frozen

        # span: the carried afm stays valid across rebuilds (re-slabbed
        # by _reslab), so only AGE triggers a refresh -- simulation.py
        refresh = (afm_age >= r_eff) if span else (trig | (afm_age >= r))
        # held-refresh target sampling per cfg.hold_predict (twin of
        # models/simulation.py hold_predict_pos)
        if span_dyn:
            tau = 0.5 * (r_eff.astype(jnp.float32) - 1.0) * cfg.dt
        else:
            tau = 0.5 * (r - 1) * cfg.dt
        p_mid = hold_predict_pos(my_pos, my_vel, my_acc, tau, cfg)
        if moments:
            # trig: this rebuild's own tables are live-exact; later
            # refreshes recompute moments at the frozen cut (sources at
            # LIVE positions, targets at p_mid)
            branch = jnp.where(
                refresh, jnp.where(trig, 1, 2), 0
            ).astype(jnp.int32)
            afm = jax.lax.switch(
                branch,
                [lambda a: afm,
                 lambda a: _farmid_slab(a, supers, tables, cfg),
                 lambda a: _refresh_farmid_slab(a, my_pos, glob[0], rctx,
                                                bands, cfg)],
                p_mid,
            )
        else:
            afm = jax.lax.cond(
                refresh,
                lambda args: _farmid_slab(args[0], args[1], args[2], cfg),
                lambda args: afm,
                (p_mid, supers, tables),
            )
        afm_age = jnp.where(refresh, 1, afm_age + 1)

        p2, v2, a2 = _near_step(
            my_pos, my_vel, my_mass, glob, bands, afm, cfg
        )
        slab = (p2, v2, my_mass, a2, my_orig)
        out = (i + 1, left - 1, afm_age, n_rb + trig.astype(jnp.int32),
               k_env, afm, slab, frozen, glob, rctx)
        if span_dyn:
            out = out + (r_eff,)
        return out

    out = jax.lax.while_loop(cond_fn, body, carry0)
    my_pos, my_vel, my_mass, my_acc, my_orig = out[6]
    # rebuild count: a REPLICATED scalar (every chip runs the same
    # schedule — the horizons come from gathered (|v|,|a|) and the
    # overflow predicate is psum'd), broadcast per-slab so the P(AXIS)
    # out_spec reassembles it losslessly; the wrapper reads element 0
    n_rb = jnp.broadcast_to(out[3], (my_pos.shape[0],))
    return my_pos, my_vel, my_mass, my_acc, my_orig, n_rb


def _pad_and_run(cfg: SimConfig, mesh: Mesh, body_fn, with_stats=False):
    """Shared wrapper: pad to a multiple of D * force_tile with massless
    clones, run the shard_map body, scatter back to original order.
    `with_stats`: the body returns a sixth per-slab output (a replicated
    scalar broadcast along rows — the rebuild count) that is returned to
    the caller as a python-facing scalar array."""
    d = mesh.devices.size
    b = cfg.force_tile
    n = cfg.n
    n_pad = -(-n // (d * b)) * (d * b)
    n_out = 6 if with_stats else 5

    body = shard_map(
        body_fn,
        mesh=mesh,
        in_specs=(P(AXIS),) * 5,
        out_specs=(P(AXIS),) * n_out,
        check_vma=False,
    )

    @jax.jit
    def run(state: ParticleState):
        pad = n_pad - n
        orig = jnp.concatenate(
            [jnp.arange(n, dtype=jnp.int32), jnp.full((pad,), n, jnp.int32)]
        )
        pos = jnp.concatenate(
            [state.pos, jnp.broadcast_to(state.pos[-1], (pad, 3))]
        )
        vel = jnp.concatenate(
            [state.vel, jnp.broadcast_to(state.vel[-1], (pad, 3))]
        )
        mass = jnp.concatenate([state.mass, jnp.zeros((pad,), state.mass.dtype)])
        acc = jnp.concatenate([state.acc, jnp.zeros((pad, 3), state.acc.dtype)])
        out = body(pos, vel, mass, acc, orig)
        pos, vel, mass, acc, orig = out[:5]
        # scatter back to original order (pad rows' orig == n: dropped)
        result = ParticleState(
            pos=jnp.zeros((n, 3), pos.dtype).at[orig].set(pos),
            vel=jnp.zeros((n, 3), vel.dtype).at[orig].set(vel),
            mass=state.mass,
            acc=jnp.zeros((n, 3), acc.dtype).at[orig].set(acc),
        )
        if with_stats:
            return result, out[5][0]
        return result

    return run


def make_sharded_runner(cfg: SimConfig, mesh: Mesh, n_cycles: int, k: int):
    """Jitted multi-chip FIXED-K band-reuse runner: advances a state
    (sharded along N in ORIGINAL order) by n_cycles * k steps and returns
    it in original order.  Pads n to a multiple of D * force_tile with
    massless clones, so any n works.

    NOTE: fixed-K reuse fails the kilostep physics gate once the core
    contracts (PERF.md round-2) — production multi-chip runs should use
    make_sharded_adaptive_runner; this runner exists for K-controlled
    experiments and as the equivalence target of the single-chip cycle
    runner."""
    return _pad_and_run(
        cfg, mesh,
        functools.partial(_sharded_cycles_body, cfg=cfg,
                          n_cycles=n_cycles, k=k),
    )


def make_sharded_adaptive_runner(cfg: SimConfig, mesh: Mesh, n_steps: int,
                                 return_stats: bool = False):
    """Jitted multi-chip ADAPTIVE band-reuse runner — the production
    config-5 path (sharded twin of make_adaptive_runner; the sharded_4m
    preset routes here via run_sharded).  With return_stats the runner
    returns (state, n_rebuilds) — the rebuild count is replicated across
    chips by construction (gathered-magnitude horizons + psum'd overflow
    feedback) and equivalence-tested against the single-chip runner's."""
    run = _pad_and_run(
        cfg, mesh,
        functools.partial(_sharded_adaptive_body, cfg=cfg, n_steps=n_steps),
        with_stats=True,
    )
    if return_stats:
        return run
    return lambda state: run(state)[0]


def run_sharded(cfg: SimConfig, mesh: Mesh, state: ParticleState,
                n_steps: int) -> ParticleState:
    """Advance n_steps on the mesh with the production policy: the
    adaptive runner when cfg.adaptive_rebuild and cfg.rebuild_every > 1
    (physics-gated reuse), else fixed-K cycles, else per-step rebuilds."""
    k = cfg.rebuild_every
    if k > 1 and cfg.adaptive_rebuild:
        return make_sharded_adaptive_runner(cfg, mesh, n_steps)(state)
    if k > 1:
        n_cycles, rem = divmod(n_steps, k)
        if n_cycles:
            state = make_sharded_runner(cfg, mesh, n_cycles, k)(state)
        if rem:
            state = make_sharded_runner(cfg, mesh, 1, rem)(state)
        return state
    return make_sharded_runner(cfg, mesh, n_steps, 1)(state)


def shard_state(state: ParticleState, mesh: Mesh) -> ParticleState:
    """Place a host state onto the mesh, sharded along N."""
    from jax.sharding import NamedSharding

    sh_n = NamedSharding(mesh, P(AXIS))
    return ParticleState(
        pos=jax.device_put(state.pos, sh_n),
        vel=jax.device_put(state.vel, sh_n),
        mass=jax.device_put(state.mass, sh_n),
        acc=jax.device_put(state.acc, sh_n),
    )
