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
* `bh_forces_grouped`     — the production path: a two-level dense group
                            decomposition (far field = dense N x G
                            monopole sweep; near field = exact P2P minus
                            the monopole, for MAC-failing groups) — see
                            the section comment below for the full design
                            rationale.  Pallas kernels on TPU
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
# Production path: two-level dense group decomposition
#
# Measured XLA gather/scatter cost on TPU is ~5-10 ns per element, so any
# traversal producing per-particle or per-group *index lists* (the natural
# GPU formulation) is memory-latency-bound here.  The TPU-native
# reformulation makes every access dense:
#
#   * particles are Morton-sorted and blocked into fixed groups of
#     `force_tile` bodies; group monopoles (mass, COM) and bounding
#     spheres come from plain reshaped reductions — no tree, no gather;
#   * FAR FIELD: every particle interacts with EVERY group monopole — a
#     dense (N x G) sweep whose source table (G x 4 floats) streams
#     through VMEM.  For any group passing the theta-criterion this is
#     exactly the Barnes-Hut monopole approximation, refined all the way
#     to `force_tile`-sized cells (i.e. at least as accurate as the
#     reference's adaptive walk at the same theta);
#   * MID BAND: for groups failing the group-level MAC
#     diam / sqrt(gap^2 + soft) < theta  (gap = distance from the source
#     COM to the target group's bounding sphere) whose 8 sub-blocks all
#     pass it, the source is refined one level: evaluate the 8
#     sub-monopoles and subtract the parent monopole the far sweep added.
#     The per-target tables are built with ONE moderate row-gather and
#     consumed by the same dense sweep kernel;
#   * NEAR FIELD: for the remaining ~dozens of groups per target whose
#     sub-blocks still fail, a correction kernel adds the exact O(B x B)
#     particle-particle panel and subtracts the parent monopole.  Source
#     particles of a group are CONTIGUOUS in the sorted order, so the
#     Pallas kernel fetches them with block DMAs, never gathers.
#
# Accuracy: every approximated cell (group or sub-block) satisfies the
# reference's own criterion width/dist < theta for EVERY particle of the
# target group (conservative sphere bound; criterion per nbody_v5.cu:232);
# everything else is computed exactly.
# ---------------------------------------------------------------------------


class GroupInfo(NamedTuple):
    """Monopole + bounding-sphere data for N/B Morton-contiguous blocks."""

    com: jax.Array      # [G, 3] mass-weighted center (0 for massless pads)
    gmass: jax.Array    # [G]    G_CONST * total mass
    center: jax.Array   # [G, 3] bounding-sphere center
    radius: jax.Array   # [G]    bounding-sphere radius
    diam: jax.Array     # [G]    MAC size: bounding-box diagonal


def pad_to_groups(pos_s, mass_s, b):
    """Pad sorted arrays to a multiple of b with zero-mass clones of the
    last particle (keeps the final group's sphere tight; massless bodies
    contribute nothing to monopoles or P2P)."""
    n = pos_s.shape[0]
    n_pad = -(-n // b) * b
    if n_pad == n:
        return pos_s, mass_s
    pos_p = jnp.concatenate([pos_s, jnp.broadcast_to(pos_s[-1], (n_pad - n, 3))])
    mass_p = jnp.concatenate([mass_s, jnp.zeros((n_pad - n,), mass_s.dtype)])
    return pos_p, mass_p


def make_group_info(pos_s: jax.Array, mass_s: jax.Array, b: int, g_const: float) -> GroupInfo:
    """Dense per-block reductions at block size `b`; len(pos_s) % b == 0."""
    g = pos_s.shape[0] // b
    p3 = pos_s.reshape(g, b, 3)
    m2 = mass_s.reshape(g, b)
    msum = jnp.sum(m2, axis=1)
    com = jnp.sum(p3 * m2[..., None], axis=1) / jnp.maximum(msum, 1e-20)[:, None]
    lo = jnp.min(p3, axis=1)
    hi = jnp.max(p3, axis=1)
    return GroupInfo(
        com=com,
        gmass=g_const * msum,
        center=0.5 * (lo + hi),
        radius=0.5 * jnp.linalg.norm(hi - lo, axis=1),
        # MAC size: the largest bbox extent — the same "cell width" the
        # reference's criterion uses (node.maxX - node.minX,
        # nbody_v5.cu:232), not the diagonal.
        diam=jnp.max(hi - lo, axis=1),
    )


# Sub-blocks per group for the mid band (a group's 8 Morton-consecutive
# children — the fixed-arity analog of one octree refinement level).
SUB_FACTOR = 8


class BandLists(NamedTuple):
    """Per-target-group source classification (see band_lists)."""

    mid_idx: jax.Array    # [G, mid_cap] int32 source ids (pad: G)
    mid_cnt: jax.Array    # [G]
    near_idx: jax.Array   # [G, near_cap] int32 source ids (pad: G)
    near_cnt: jax.Array   # [G]
    mid_overflow: jax.Array   # [] bool
    near_overflow: jax.Array  # [] bool


def band_lists(
    groups: GroupInfo, sub_diam_max: jax.Array, cfg: SimConfig,
    tgt_subs: GroupInfo | None = None,
) -> BandLists:
    """Classify every (target group, source group) pair into three bands.

    With dist = sqrt(gap^2 + soft) and gap the distance from the source
    COM to the target's bounding sphere (conservative: a lower bound on
    every member particle's distance):

      far  : diam_src / dist < theta          -> parent monopole OK
             (handled implicitly by the dense far sweep)
      mid  : parent fails, but even the largest of its 8 sub-blocks
             satisfies sub_diam_max / dist < theta -> evaluate the 8
             sub-monopoles and subtract the parent monopole
      near : a sub-block still fails          -> exact P2P minus parent

    Every approximated cell therefore satisfies the reference's own
    criterion width/dist < theta (nbody_v5.cu:232); near pairs are exact.
    Evaluated in target chunks to bound the (chunk x G) panel memory.
    """
    g = groups.com.shape[0]
    mid_cap, near_cap = cfg.mid_cap, cfg.near_cap
    soft = soft_term(cfg)
    theta = cfg.theta
    n_sub = SUB_FACTOR if tgt_subs is not None else 1
    chunk = max(16, min(512, (1 << 22) // max(g * n_sub, 1)))
    g_pad = -(-g // chunk) * chunk
    src_ids = jnp.arange(g, dtype=_I32)[None, :]

    def one_chunk(args):
        center_c, radius_c = args   # [C, S, 3], [C, S] target sub-spheres
        d = groups.com[None, :, None, :] - center_c[:, None, :, :]  # [C,G,S,3]
        gap_s = jnp.maximum(
            jnp.sqrt(jnp.sum(d * d, axis=-1)) - radius_c[:, None, :], 0.0
        )
        # conservative over the target's members: min over its sub-spheres.
        # Sub-spheres (vs one whole-group sphere) keep the bound tight even
        # for Morton-seam targets whose overall bbox spans the domain.
        gap = jnp.min(gap_s, axis=-1)                      # [C, G]
        dist = jnp.sqrt(gap * gap + soft)
        fail0 = groups.diam[None, :] / dist >= theta
        sub_ok = sub_diam_max[None, :] / dist < theta
        mid = fail0 & sub_ok
        near = fail0 & ~sub_ok

        # Row compaction by ONE sort per row (scatter-based compaction
        # costs ~6 ns per element on TPU — 12x slower at G x G scale).
        # Key layout: mid cols ascending, then near cols offset by g,
        # then 2g for far/pass — so one sorted row yields both lists.
        key = jnp.where(mid, src_ids, jnp.where(near, src_ids + g, 2 * g))
        skey = lax.sort(key, dimension=1)                 # [C, G]
        extra = max(0, mid_cap + near_cap - g)
        if extra:
            skey = jnp.pad(skey, ((0, 0), (0, extra)), constant_values=2 * g)
        mc = jnp.sum(mid.astype(_I32), axis=1)
        nc = jnp.sum(near.astype(_I32), axis=1)
        lane_m = jnp.arange(mid_cap, dtype=_I32)[None, :]
        mi = jnp.where(lane_m < mc[:, None], skey[:, :mid_cap], g)
        lane_n = jnp.arange(near_cap, dtype=_I32)[None, :]
        pick = jnp.clip(mc[:, None] + lane_n, 0, skey.shape[1] - 1)
        ni = jnp.take_along_axis(skey, pick, axis=1) - g
        ni = jnp.where(lane_n < nc[:, None], ni, g)
        return (mi, jnp.minimum(mc, mid_cap), ni, jnp.minimum(nc, near_cap),
                jnp.any(mc > mid_cap), jnp.any(nc > near_cap))

    # Per-target sub-spheres: the 8 sub-block bounding spheres when
    # available, else the single group sphere.
    if tgt_subs is not None:
        s = SUB_FACTOR
        centers = tgt_subs.center.reshape(g, s, 3)
        radii = tgt_subs.radius.reshape(g, s)
    else:
        centers = groups.center[:, None, :]
        radii = groups.radius[:, None]
    s = centers.shape[1]
    pad = g_pad - g
    centers = jnp.pad(centers, ((0, pad), (0, 0), (0, 0)))
    radii = jnp.pad(radii, ((0, pad), (0, 0)))
    mi, mc, ni, nc, mo, no = lax.map(
        one_chunk,
        (centers.reshape(-1, chunk, s, 3), radii.reshape(-1, chunk, s)),
    )
    return BandLists(
        mid_idx=mi.reshape(g_pad, mid_cap)[:g],
        mid_cnt=mc.reshape(g_pad)[:g],
        near_idx=ni.reshape(g_pad, near_cap)[:g],
        near_cnt=nc.reshape(g_pad)[:g],
        mid_overflow=jnp.any(mo),
        near_overflow=jnp.any(no),
    )


def build_mid_tables(
    groups: GroupInfo, subs: GroupInfo, mid_idx: jax.Array, near_idx: jax.Array
) -> jax.Array:
    """Gather per-target mid-band source tables
    [T, mid_cap*9 + near_cap, 4].

    Each MID pair contributes 9 rows: its 8 sub-block monopoles plus the
    parent monopole with NEGATED mass (the far sweep already added the
    parent; the anti-row cancels it).  Each NEAR pair contributes only its
    anti-parent row — its exact P2P comes from the near kernel, which is
    then pure particle-particle work.  Row layout: [x, y, z, G*mass];
    padding pairs (id == G) hit an all-zero row.
    """
    g = groups.com.shape[0]
    t = mid_idx.shape[0]          # may be a target slab (multi-chip)
    sub4 = jnp.concatenate(
        [subs.com, subs.gmass[:, None]], axis=1
    ).reshape(g, SUB_FACTOR, 4)
    par4 = jnp.concatenate([groups.com, -groups.gmass[:, None]], axis=1)
    ext = jnp.concatenate([sub4, par4[:, None, :]], axis=1)   # [G, 9, 4]
    ext_flat = jnp.concatenate(
        [ext.reshape(g, 9 * 4), jnp.zeros((1, 9 * 4), jnp.float32)]
    )
    mid_tab = ext_flat[mid_idx].reshape(t, -1, 4)             # [T, mid_cap*9, 4]
    par_ext = jnp.concatenate([par4, jnp.zeros((1, 4), jnp.float32)])
    near_tab = par_ext[near_idx]                              # [T, near_cap, 4]
    return jnp.concatenate([mid_tab, near_tab], axis=1)


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


def far_sweep_jnp(pos_s: jax.Array, groups: GroupInfo, cfg: SimConfig) -> jax.Array:
    """Dense N x G monopole forces (jnp twin of the Pallas kernel)."""
    soft = soft_term(cfg)
    b = cfg.force_tile
    blocks = pos_s.reshape(-1, b, 3)

    def one(pb):
        # gmass already includes G_CONST, so pass g=1
        return _panel_accel(pb, groups.com, groups.gmass, 1.0, soft)

    acc = lax.map(one, blocks)
    return acc.reshape(-1, 3)


def near_correction_jnp(
    tgt_pos: jax.Array, src_pos: jax.Array, src_mass: jax.Array,
    groups: GroupInfo, near_idx: jax.Array, cfg: SimConfig,
) -> jax.Array:
    """Exact P2P against every near source group (jnp twin of the Pallas
    kernel; gathers — CPU/tests only).  The matching anti-parent monopole
    rows live in the mid tables (build_mid_tables), so this band is pure
    particle-particle work.

    Targets may be a slab of the global sorted order (multi-chip); sources
    and groups are always global.
    """
    b = cfg.force_tile
    n = tgt_pos.shape[0]
    g = groups.com.shape[0]
    soft = soft_term(cfg)
    tp3 = tgt_pos.reshape(-1, b, 3)
    p3 = src_pos.reshape(g, b, 3)
    m2 = src_mass.reshape(g, b)

    def one(args):
        pb, idx = args                       # [B,3], [C]
        ic = jnp.clip(idx, 0, g - 1)
        q = p3[ic].reshape(-1, 3)            # [C*B, 3] source particles
        qm = jnp.where(idx[:, None] < g, m2[ic], 0.0).reshape(-1)
        return _panel_accel(pb, q, qm, cfg.g, soft)

    acc = lax.map(one, (tp3, near_idx))
    return acc.reshape(n, 3)


def bh_forces_grouped(pos_s: jax.Array, mass_s: jax.Array, cfg: SimConfig) -> jax.Array:
    """Production Barnes-Hut forces on Morton-sorted, group-padded arrays.

    three-band telescoping:
      dense far monopole sweep (all groups)
    + mid-band sub-monopole tables (parent fails theta, sub-blocks pass)
    + near-band exact P2P (sub-blocks fail too), each minus the parent
      monopole the far sweep already applied.
    Pallas kernels on TPU; jnp twins elsewhere.
    """
    b = cfg.force_tile
    groups = make_group_info(pos_s, mass_s, b, cfg.g)
    subs = make_group_info(pos_s, mass_s, b // SUB_FACTOR, cfg.g)
    g = groups.com.shape[0]
    sub_diam_max = jnp.max(subs.diam.reshape(g, SUB_FACTOR), axis=1)
    bands = band_lists(groups, sub_diam_max, cfg, tgt_subs=subs)
    mid_tab = build_mid_tables(groups, subs, bands.mid_idx, bands.near_idx)

    if cfg.use_pallas:
        from nbody_tpu.ops.pallas.forces import (
            far_sweep_pallas, table_sweep_pallas, near_correction_pallas,
        )

        far = far_sweep_pallas(pos_s, groups, cfg)
        mid = table_sweep_pallas(pos_s, mid_tab, cfg)
        near = near_correction_pallas(
            pos_s, pos_s, mass_s, groups, bands.near_idx, bands.near_cnt, cfg
        )
    else:
        far = far_sweep_jnp(pos_s, groups, cfg)
        mid = table_sweep_jnp(pos_s, mid_tab, cfg)
        near = near_correction_jnp(
            pos_s, pos_s, mass_s, groups, bands.near_idx, cfg
        )
    return far + mid + near
