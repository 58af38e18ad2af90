"""Gravity force computation.

Three implementations, all returning accelerations [N, 3]:

* `direct_forces`         — all-pairs O(N^2), the permanent correctness
                            oracle (reference: computeForceN2Kernel in
                            nbody_simple.exe).  Blocked so the (B, N)
                            interaction panels use the MXU distance trick.
* `bh_forces_reference`   — per-particle stackless walk over the escape-
                            linearized tree (a vmapped lax.while_loop).
                            Semantically the corrected version of the CUDA
                            stack walk (nbody_v5.cu:215-249; see SURVEY.md
                            §2.4 #1 for why v5's own leaf test is buggy and
                            the legacy disjoint-id convention is adopted).
* `bh_forces_grouped`     — the production path: a hierarchical dense
                            band decomposition over adaptive octree source
                            cells (supers -> cells -> children -> exact
                            P2P) — see the section comment below for the
                            full design rationale.  Pallas kernels on TPU
                            (nbody_tpu.ops.pallas.forces).

Force law (v5, nbody_v5.cu:231-237):  dist = sqrt(|d|^2 + SOFTENING),
a += G * m / dist^3 * d.   The legacy generation used |d|^2 + SOFTENING^2
(basics.txt:104); both are expressed through `soft_term`.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from nbody_tpu.config import SimConfig
from nbody_tpu.ops.tree import LinearTree

_I32 = jnp.int32


def soft_term(cfg: SimConfig) -> float:
    """The additive term inside the sqrt: v5 adds SOFTENING raw to the
    squared distance (nbody_v5.cu:231); legacy adds SOFTENING^2."""
    return cfg.softening**2 if cfg.legacy_softening else cfg.softening


# ---------------------------------------------------------------------------
# Direct O(N^2)
# ---------------------------------------------------------------------------


def _panel_accel(pos_blk, pos_all, mass_all, g, soft):
    """Acceleration of a (B,3) block against all (N,3) sources.

    Deliberately NOT the matmul trick |p-q|^2 = p^2 + q^2 - 2pq: with
    galaxy-scale coordinates (~2000) and close pairs (separation ~1) that
    form loses the separation to fp32 cancellation, and a K=3 MXU
    contraction wastes 125/128 of the systolic array anyway.  Explicit
    coordinate differences keep full precision and run on the VPU.
    """
    dx = pos_all[None, :, 0] - pos_blk[:, None, 0]       # [B, N]
    dy = pos_all[None, :, 1] - pos_blk[:, None, 1]
    dz = pos_all[None, :, 2] - pos_blk[:, None, 2]
    d2 = dx * dx + dy * dy + dz * dz
    inv = lax.rsqrt(d2 + soft)
    w = (g * mass_all)[None, :] * (inv * inv * inv)      # [B, N]
    return jnp.stack(
        [jnp.sum(w * dx, axis=1), jnp.sum(w * dy, axis=1), jnp.sum(w * dz, axis=1)],
        axis=1,
    )


def direct_forces(pos: jax.Array, mass: jax.Array, cfg: SimConfig, block: int = 1024) -> jax.Array:
    """All-pairs gravity.  Self-interaction contributes exactly zero
    (d = 0), matching the softened CUDA kernels where the self term's
    direction vector vanishes."""
    n = pos.shape[0]
    g, soft = cfg.g, soft_term(cfg)
    if n <= block:
        return _panel_accel(pos, pos, mass, g, soft)
    # Pad to a block multiple and scan over row panels to bound memory.
    n_pad = -(-n // block) * block
    pos_p = jnp.pad(pos, ((0, n_pad - n), (0, 0)))
    blocks = pos_p.reshape(n_pad // block, block, 3)
    acc = lax.map(lambda pb: _panel_accel(pb, pos, mass, g, soft), blocks)
    return acc.reshape(n_pad, 3)[:n]


# ---------------------------------------------------------------------------
# Barnes-Hut: per-particle reference traversal
# ---------------------------------------------------------------------------


def bh_forces_reference(pos_sorted: jax.Array, tree: LinearTree, cfg: SimConfig) -> jax.Array:
    """Stackless per-particle walk — the semantic reference for the tiled
    path.  Accept rule: width / dist < theta (leaves have width 0, so they
    are always accepted; a particle's own leaf adds zero).

    Replaces the 64-deep explicit stack DFS of computeForceKernel
    (nbody_v5.cu:220-245) with escape-index stepping: accept -> jump to
    escape, open -> +1.
    """
    m_nodes = tree.n_nodes
    g, soft, theta = cfg.g, soft_term(cfg), cfg.theta

    def walk(p):
        def cond(carry):
            ptr, _ = carry
            return ptr < m_nodes

        def body(carry):
            ptr, acc = carry
            d = tree.com[ptr] - p
            dist = jnp.sqrt(jnp.sum(d * d) + soft)
            accept = tree.width[ptr] / dist < theta
            f = g * tree.mass[ptr] / (dist * dist * dist)
            acc = jnp.where(accept, acc + f * d, acc)
            ptr = jnp.where(accept, tree.escape[ptr], ptr + 1)
            return ptr, acc

        _, acc = lax.while_loop(cond, body, (_I32(0), jnp.zeros(3, jnp.float32)))
        return acc

    return jax.vmap(walk)(pos_sorted)


# ---------------------------------------------------------------------------
# Production path: hierarchical dense band decomposition
#
# Measured XLA gather/scatter cost on TPU is ~5-10 ns per element and
# per-small-DMA latency is ~1 us, so any per-particle traversal producing
# index lists (the natural GPU formulation) is memory-latency-bound here.
# The TPU-native reformulation makes every hot access dense or a large
# contiguous DMA:
#
#   * particles are Morton-sorted; SOURCES are grouped into ADAPTIVE
#     OCTREE CELLS of <= force_tile bodies (ops/cells.py — scan-only
#     construction), 8 consecutive cells aggregate into a SUPER, and each
#     cell's depth+1 children provide one refinement level.  TARGETS are
#     fixed force_tile blocks whose 8 sub-block bounding spheres give a
#     tight conservative MAC bound (min gap over sub-spheres) even for
#     Morton-seam blocks;
#   * FAR FIELD: every particle against every SUPER monopole — a dense
#     (N x S) sweep whose source table streams through VMEM;
#   * BAND TABLES: supers failing the MAC  diam / sqrt(gap^2+soft) < theta
#     are refined to their 8 member-cell monopoles (+ an anti-super row
#     cancelling the far sweep's term); cells that still fail but whose
#     children pass are refined to their 8 child monopoles (+ anti-cell).
#     All rows are gathered into per-target tables with a few moderate
#     row-gathers and consumed by ONE dense sweep kernel;
#   * NEAR FIELD: cells whose children also fail get exact O(B x count)
#     particle-particle panels (+ an anti-cell table row).  A cell's
#     particles are CONTIGUOUS in the sorted order, so the Pallas kernel
#     fetches 128-aligned spans with block DMAs, never gathers.
#
# Accuracy: every monopole-approximated region (super, cell, or child)
# satisfies the reference's own criterion width/dist < theta for EVERY
# particle of the target block (criterion per nbody_v5.cu:232);
# everything else is computed exactly.  Band-list classification is
# two-stage (supers first, then only the failing supers' cells) so the
# classification panel is T x (sup_cap*8), not T x G_cells, and row
# compaction is one sort (scatter-based compaction measured ~6x slower).
#
# Band-cap overflow degrades GRACEFULLY: a pair dropped from a band list
# loses both its refinement rows and the matching anti-row (they come from
# the same list), so the source simply stays at the coarser monopole the
# previous level already applied — a local theta violation for that pair,
# never a missing or double-counted force.  The overflow flags report it.
# ---------------------------------------------------------------------------


class GroupInfo(NamedTuple):
    """Bounding data for the fixed TARGET blocks of `force_tile` bodies."""

    center: jax.Array   # [T, 3] bounding-sphere center
    radius: jax.Array   # [T]    bounding-sphere radius


# Sub-spheres per target block: the MAC is evaluated against each target's
# 8 sub-block bounding spheres (min gap) — tight even for Morton-seam
# blocks whose overall bbox spans the domain.
SUB_FACTOR = 8


def pad_to_groups(pos_s, mass_s, b):
    """Pad sorted arrays to a multiple of b with zero-mass clones of the
    last particle (keeps the final block's spheres tight; massless bodies
    contribute nothing to monopoles or P2P)."""
    n = pos_s.shape[0]
    n_pad = -(-n // b) * b
    if n_pad == n:
        return pos_s, mass_s
    pos_p = jnp.concatenate([pos_s, jnp.broadcast_to(pos_s[-1], (n_pad - n, 3))])
    mass_p = jnp.concatenate([mass_s, jnp.zeros((n_pad - n,), mass_s.dtype)])
    return pos_p, mass_p


def pad_sorted(pos_s, mass_s, codes_s, b):
    """pad_to_groups plus the matching Morton codes (clones of the last
    particle keep the sorted order valid)."""
    n = pos_s.shape[0]
    pos_p, mass_p = pad_to_groups(pos_s, mass_s, b)
    n_pad = pos_p.shape[0]
    if n_pad == n:
        return pos_p, mass_p, codes_s
    codes_p = jnp.concatenate(
        [codes_s, jnp.broadcast_to(codes_s[-1], (n_pad - n,))]
    )
    return pos_p, mass_p, codes_p


def target_subspheres(pos_s: jax.Array, b: int) -> GroupInfo:
    """Bounding spheres of each target block's SUB_FACTOR sub-blocks,
    shaped [T * SUB_FACTOR]."""
    sb = b // SUB_FACTOR
    p3 = pos_s.reshape(-1, sb, 3)
    lo = jnp.min(p3, axis=1)
    hi = jnp.max(p3, axis=1)
    return GroupInfo(
        center=0.5 * (lo + hi),
        radius=0.5 * jnp.linalg.norm(hi - lo, axis=1),
    )


class Supers(NamedTuple):
    """Level-2 source aggregates: 8 consecutive adaptive cells each.

    `com`/`gmass` feed the dense far sweep (far_sweep_* reads exactly
    these two fields); diam is the MAC size for refinement to cells.
    """

    com: jax.Array      # [S, 3]
    gmass: jax.Array    # [S]
    diam: jax.Array     # [S] max bbox extent over member cells
    n_supers: jax.Array # [] int32 (ceil(n_cells / 8))


def make_supers(cells) -> Supers:
    g_cap = cells.gmass.shape[0]
    s = g_cap // 8
    gm = cells.gmass.reshape(s, 8)
    msum = jnp.sum(gm, axis=1)
    com = jnp.sum(
        cells.com.reshape(s, 8, 3) * gm[..., None], axis=1
    ) / jnp.maximum(msum, 1e-20)[:, None]
    lo = jnp.min(cells.lo.reshape(s, 8, 3), axis=1)
    hi = jnp.max(cells.hi.reshape(s, 8, 3), axis=1)
    valid = msum > 0
    diam = jnp.where(valid, jnp.max(hi - lo, axis=1), 0.0)
    return Supers(
        com=jnp.where(valid[:, None], com, 0.0),
        gmass=msum,
        diam=diam,
        n_supers=(cells.n_cells + 7) // 8,
    )


class CellBands(NamedTuple):
    """Per-target source classification over the adaptive cell hierarchy.

    sup: supers failing the MAC (refine to their 8 cells);
    mid: cells failing whose children all pass (refine to children);
    near: cells whose children still fail (exact P2P).
    """

    sup_idx: jax.Array    # [T, sup_cap] int32 super ids (pad: n_sup_cap)
    sup_cnt: jax.Array
    mid_idx: jax.Array    # [T, mid_cap] int32 cell ids (pad: g_cap)
    mid_cnt: jax.Array
    near_idx: jax.Array   # [T, near_cap] int32 cell ids (pad: g_cap)
    near_cnt: jax.Array
    sup_overflow: jax.Array
    mid_overflow: jax.Array
    near_overflow: jax.Array


def _row_compact_two(key_lo, key_hi, big, cap_lo, cap_hi):
    """Sort-based row compaction of two disjoint ascending-key classes.

    key_lo/key_hi: [C, K] int32 keys, `big` for absent.  Returns
    (lo_idx, lo_cnt, hi_idx, hi_cnt) with hi keys de-offset by `big//2`.
    (Scatter-based compaction measured ~6x slower at panel scale.)
    """
    c = key_lo.shape[0]
    merged = jnp.minimum(key_lo, key_hi)
    skey = lax.sort(merged, dimension=1)
    lo_cnt = jnp.sum((key_lo < big).astype(_I32), axis=1)
    hi_cnt = jnp.sum((key_hi < big).astype(_I32), axis=1)
    width = skey.shape[1]
    extra = max(0, cap_lo + cap_hi - width)
    if extra:
        skey = jnp.pad(skey, ((0, 0), (0, extra)), constant_values=big)
    lane_l = jnp.arange(cap_lo, dtype=_I32)[None, :]
    lo_idx = jnp.where(lane_l < lo_cnt[:, None], skey[:, :cap_lo], big)
    lane_h = jnp.arange(cap_hi, dtype=_I32)[None, :]
    pick = jnp.clip(lo_cnt[:, None] + lane_h, 0, skey.shape[1] - 1)
    hi_idx = jnp.take_along_axis(skey, pick, axis=1) - big // 2
    hi_idx = jnp.where(lane_h < hi_cnt[:, None], hi_idx, big)
    return lo_idx, lo_cnt, hi_idx, hi_cnt


def cell_band_lists(
    tgt_subs: GroupInfo, supers: Supers, cells, cfg: SimConfig
) -> CellBands:
    """Two-stage classification, chunked over targets.

    Stage 1 tests every SUPER against the target's sub-spheres (min gap);
    failing supers are listed.  Stage 2 gathers only the ~sup_cap*8
    candidate cells of those supers and classifies each as keep-monopole /
    refine-to-children (mid) / exact (near).  This keeps the classified
    panel at T x (sup_cap*8) instead of T x G_cells.
    """
    s_cap = cfg.sup_cap
    mid_cap, near_cap = cfg.mid_cap, cfg.near_cap
    theta = cfg.theta
    soft = soft_term(cfg)
    n_sup = supers.com.shape[0]
    g_cap = cells.gmass.shape[0]
    t = tgt_subs.center.shape[0] // SUB_FACTOR
    big = jnp.iinfo(jnp.int32).max // 2 * 2  # even sentinel

    # packed per-cell fields for stage 2: [g_cap+1, 11] (zero pad row):
    # com(3), diam, child_diam_max, child-COM box lo(3), hi(3).
    # The child-acceptance bound needs "closest possible child COM"; the
    # exact child COMs are known per cell, so their bounding box is a
    # tight-and-correct bound (the full parent cell box is ~40% slower).
    kid_ok = cells.child_gmass > 0
    big_f = jnp.float32(3.0e38)
    cc_lo = jnp.min(jnp.where(kid_ok[..., None], cells.child_com, big_f), axis=1)
    cc_hi = jnp.max(jnp.where(kid_ok[..., None], cells.child_com, -big_f), axis=1)
    cellf = jnp.concatenate(
        [cells.com, cells.diam[:, None], cells.child_diam_max[:, None],
         cc_lo, cc_hi], axis=1
    )
    cellf = jnp.concatenate([cellf, jnp.zeros((1, 11), jnp.float32)])

    centers = tgt_subs.center.reshape(t, SUB_FACTOR, 3)
    radii = tgt_subs.radius.reshape(t, SUB_FACTOR)
    chunk = max(8, min(256, (1 << 20) // max(n_sup, 1)))
    t_pad = -(-t // chunk) * chunk
    centers = jnp.pad(centers, ((0, t_pad - t), (0, 0), (0, 0)))
    radii = jnp.pad(radii, ((0, t_pad - t), (0, 0)))
    # mask: which rows of each chunk are REAL targets (padding rows sit at
    # the origin and would otherwise trip the overflow flags)
    row_real = (jnp.arange(t_pad, dtype=_I32) < t).reshape(-1, chunk)

    sup_ids = jnp.arange(n_sup, dtype=_I32)[None, :]

    def min_gap(com, ctr, rad):
        # com [.., 3] sources; ctr [C, S, 3], rad [C, S] target sub-spheres
        d = com[None, :, None, :] - ctr[:, None, :, :]
        gap = jnp.sqrt(jnp.sum(d * d, axis=-1)) - rad[:, None, :]
        return jnp.maximum(jnp.min(gap, axis=-1), 0.0)

    def one_chunk(args):
        ctr, rad, real = args                # [C,S,3],[C,S],[C]
        # stage 1: supers
        gap = min_gap(supers.com, ctr, rad)                # [C, n_sup]
        dist = jnp.sqrt(gap * gap + soft)
        fail2 = supers.diam[None, :] / dist >= theta
        key = jnp.where(fail2, sup_ids, big)
        skey = lax.sort(key, dimension=1)
        sup_cnt = jnp.sum(fail2.astype(_I32), axis=1)
        if s_cap > n_sup:
            skey = jnp.pad(skey, ((0, 0), (0, s_cap - n_sup)), constant_values=big)
        lane = jnp.arange(s_cap, dtype=_I32)[None, :]
        sup_idx = jnp.where(lane < sup_cnt[:, None], skey[:, :s_cap], big)

        # stage 2: the failing supers' cells (clamp BEFORE expanding — the
        # `big` padding sentinel would overflow int32 when multiplied)
        sup_c = jnp.minimum(sup_idx, n_sup)                # pad -> n_sup
        cand = sup_c[:, :, None] * 8 + jnp.arange(8, dtype=_I32)[None, None, :]
        cand = jnp.minimum(cand, g_cap).reshape(ctr.shape[0], -1)  # pad -> g_cap
        f = cellf[cand]                                    # [C, K, 11]
        # cell-as-monopole test: distance to the cell's own COM (the
        # reference's criterion, nbody_v5.cu:232), conservative over the
        # target's members via its sub-spheres
        d = f[..., 0:3][:, :, None, :] - ctr[:, None, :, :]
        gapc = jnp.maximum(
            jnp.min(jnp.sqrt(jnp.sum(d * d, axis=-1)) - rad[:, None, :], axis=-1),
            0.0,
        )
        distc = jnp.sqrt(gapc * gapc + soft)
        diam = f[..., 3]
        cdm = f[..., 4]
        # child-acceptance test: conservative distance is the gap from the
        # target sub-spheres to the bounding box of the CHILD COMs (every
        # child monopole sits inside it), not to the parent COM
        blo = f[..., 5:8]
        bhi = f[..., 8:11]
        cl = jnp.clip(ctr[:, None, :, :], blo[:, :, None, :], bhi[:, :, None, :])
        gap_box = jnp.linalg.norm(cl - ctr[:, None, :, :], axis=-1) - rad[:, None, :]
        gap_box = jnp.maximum(jnp.min(gap_box, axis=-1), 0.0)
        dist_box = jnp.sqrt(gap_box * gap_box + soft)
        failc = (diam / distc >= theta) & (cand < g_cap)
        midm = failc & (cdm / dist_box < theta)
        nearm = failc & ~midm
        key_m = jnp.where(midm, cand, big)
        key_n = jnp.where(nearm, cand + big // 2, big)
        mi, mc, ni, nc = _row_compact_two(key_m, key_n, big, mid_cap, near_cap)
        return (
            jnp.minimum(sup_idx, n_sup), jnp.minimum(sup_cnt, s_cap),
            jnp.minimum(mi, g_cap), jnp.minimum(mc, mid_cap),
            jnp.minimum(ni, g_cap), jnp.minimum(nc, near_cap),
            jnp.any(real & (sup_cnt > s_cap)),
            jnp.any(real & (mc > mid_cap)),
            jnp.any(real & (nc > near_cap)),
        )

    res = lax.map(
        one_chunk,
        (centers.reshape(-1, chunk, SUB_FACTOR, 3),
         radii.reshape(-1, chunk, SUB_FACTOR),
         row_real),
    )
    si, sc, mi, mc, ni, nc, so, mo, no = res
    return CellBands(
        sup_idx=si.reshape(t_pad, s_cap)[:t],
        sup_cnt=sc.reshape(t_pad)[:t],
        mid_idx=mi.reshape(t_pad, mid_cap)[:t],
        mid_cnt=mc.reshape(t_pad)[:t],
        near_idx=ni.reshape(t_pad, near_cap)[:t],
        near_cnt=nc.reshape(t_pad)[:t],
        sup_overflow=jnp.any(so),
        mid_overflow=jnp.any(mo),
        near_overflow=jnp.any(no),
    )


def build_cell_tables(cells, supers: Supers, bands: CellBands) -> jax.Array:
    """Per-target source tables [T, sup_cap*9 + mid_cap*9 + near_cap, 4].

    Row layout [x, y, z, G*mass]:
      * each failing SUPER contributes its 8 member-cell monopoles plus
        the super monopole with negated mass (the far sweep added it);
      * each MID cell contributes its 8 child monopoles plus itself
        negated (band A added the cell monopole);
      * each NEAR cell contributes only its negated self — its exact P2P
        comes from the near kernel.
    Padding ids resolve to an all-zero row.
    """
    g_cap = cells.gmass.shape[0]
    n_sup = supers.com.shape[0]
    t = bands.sup_idx.shape[0]

    cell4 = jnp.concatenate([cells.com, cells.gmass[:, None]], axis=1)
    extA = jnp.concatenate(
        [cell4.reshape(n_sup, 8, 4),
         jnp.concatenate([supers.com, -supers.gmass[:, None]], axis=1)[:, None, :]],
        axis=1,
    ).reshape(n_sup, 36)
    extA = jnp.concatenate([extA, jnp.zeros((1, 36), jnp.float32)])
    tabA = extA[jnp.minimum(bands.sup_idx, n_sup)].reshape(t, -1, 4)

    child4 = jnp.concatenate(
        [cells.child_com, cells.child_gmass[..., None]], axis=-1
    )                                                       # [g_cap, 8, 4]
    extB = jnp.concatenate(
        [child4, jnp.concatenate([cells.com, -cells.gmass[:, None]], axis=1)[:, None, :]],
        axis=1,
    ).reshape(g_cap, 36)
    extB = jnp.concatenate([extB, jnp.zeros((1, 36), jnp.float32)])
    tabB = extB[jnp.minimum(bands.mid_idx, g_cap)].reshape(t, -1, 4)

    anti = jnp.concatenate([cells.com, -cells.gmass[:, None]], axis=1)
    anti = jnp.concatenate([anti, jnp.zeros((1, 4), jnp.float32)])
    tabN = anti[jnp.minimum(bands.near_idx, g_cap)]

    return jnp.concatenate([tabA, tabB, tabN], axis=1)


def table_sweep_jnp(tgt_pos: jax.Array, tables: jax.Array, cfg: SimConfig) -> jax.Array:
    """Per-target dense sweep over gathered source tables [T, S, 4]
    (jnp twin of pallas.table_sweep_pallas)."""
    b = cfg.force_tile
    soft = soft_term(cfg)
    t = tgt_pos.shape[0] // b

    def one(args):
        pb, tab = args
        return _panel_accel(pb, tab[:, 0:3], tab[:, 3], 1.0, soft)

    acc = lax.map(one, (tgt_pos.reshape(t, b, 3), tables))
    return acc.reshape(-1, 3)


def far_sweep_jnp(pos_s: jax.Array, supers: Supers, cfg: SimConfig) -> jax.Array:
    """Dense N x S super-monopole forces (jnp twin of the Pallas kernel)."""
    soft = soft_term(cfg)
    b = cfg.force_tile
    blocks = pos_s.reshape(-1, b, 3)

    def one(pb):
        # gmass already includes G_CONST, so pass g=1
        return _panel_accel(pb, supers.com, supers.gmass, 1.0, soft)

    acc = lax.map(one, blocks)
    return acc.reshape(-1, 3)


def near_correction_jnp(
    tgt_pos: jax.Array, src_pos: jax.Array, src_mass: jax.Array,
    cells, near_idx: jax.Array, cfg: SimConfig,
) -> jax.Array:
    """Exact P2P against every near cell (jnp twin of the Pallas kernel;
    gathers — CPU/tests only).  The matching anti-cell monopole rows live
    in the band tables, so this band is pure particle-particle work.

    Targets may be a slab of the global sorted order (multi-chip); the
    source particle arrays and cells are always global.
    """
    b = cfg.force_tile
    n = tgt_pos.shape[0]
    n_src = src_pos.shape[0]
    g_cap = cells.gmass.shape[0]
    soft = soft_term(cfg)
    tp3 = tgt_pos.reshape(-1, b, 3)
    lane = jnp.arange(b, dtype=_I32)[None, :]

    first_x = jnp.concatenate([cells.first, jnp.zeros((1,), _I32)])
    count_x = jnp.concatenate([cells.count, jnp.zeros((1,), _I32)])

    def one(args):
        pb, idx = args                       # [B,3], [C]
        f = first_x[idx]                     # [C]
        c = count_x[idx]
        pick = jnp.clip(f[:, None] + lane, 0, n_src - 1)   # [C, B]
        ok = lane < c[:, None]
        q = src_pos[pick].reshape(-1, 3)
        qm = jnp.where(ok, src_mass[pick], 0.0).reshape(-1)
        return _panel_accel(pb, q, qm, cfg.g, soft)

    acc = lax.map(one, (tp3, near_idx))
    return acc.reshape(n, 3)


def build_bands(pos_s: jax.Array, mass_s: jax.Array, codes_s: jax.Array, cfg: SimConfig):
    """The shared band-construction prologue of the production force path:
    adaptive cells -> supers -> target sub-spheres -> band lists -> tables.
    Single source of truth for bh_forces_grouped, the sharded step,
    diagnostics, and the phase profiler.  Inputs must be Morton-sorted and
    padded to a force_tile multiple (pad_sorted)."""
    from nbody_tpu.ops import bbox as _bbox
    from nbody_tpu.ops.cells import build_source_cells

    b = cfg.force_tile
    # same cubified box the codes were quantized against (padding clones
    # the last particle, so min/max are unchanged)
    box_lo, box_size = _bbox.bounding_cube(pos_s)
    cells = build_source_cells(
        codes_s, pos_s, mass_s, b, cfg.g, cfg.cell_capacity, box_lo, box_size
    )
    supers = make_supers(cells)
    tgt_subs = target_subspheres(pos_s, b)
    bands = cell_band_lists(tgt_subs, supers, cells, cfg)
    tables = build_cell_tables(cells, supers, bands)
    return cells, supers, bands, tables


def bh_forces_grouped(
    pos_s: jax.Array, mass_s: jax.Array, codes_s: jax.Array, cfg: SimConfig
) -> jax.Array:
    """Production Barnes-Hut forces on Morton-sorted, block-padded arrays.

    Hierarchy: supers (8 cells) -> adaptive octree cells (<= force_tile
    bodies) -> children (depth+1 cells).  Telescoping bands:
      dense far sweep over all super monopoles
    + per-target tables: failing supers -> cell monopoles; failing cells
      with passing children -> child monopoles; each refinement carries an
      anti-row cancelling the coarser term
    + exact P2P for cells whose children still fail.
    Every approximated cell satisfies width/dist < theta for every target
    particle (conservative sub-sphere bound; criterion per nbody_v5.cu:232).
    """
    cells, supers, bands, tables = build_bands(pos_s, mass_s, codes_s, cfg)

    if cfg.use_pallas:
        from nbody_tpu.ops.pallas.forces import (
            far_sweep_pallas, table_sweep_pallas, near_correction_pallas,
        )

        far = far_sweep_pallas(pos_s, supers, cfg)
        mid = table_sweep_pallas(pos_s, tables, cfg)
        near = near_correction_pallas(
            pos_s, pos_s, mass_s, cells, bands.near_idx, bands.near_cnt, cfg
        )
    else:
        far = far_sweep_jnp(pos_s, supers, cfg)
        mid = table_sweep_jnp(pos_s, tables, cfg)
        near = near_correction_jnp(
            pos_s, pos_s, mass_s, cells, bands.near_idx, cfg
        )
    return far + mid + near
