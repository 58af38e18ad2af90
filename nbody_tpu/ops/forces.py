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

# Near-band spans are split at SPAN_ALIGN particle boundaries so every
# span lies inside ONE aligned SPAN_ALIGN-wide window of the sorted
# arrays: the P2P kernel then DMAs exactly that window (HBM DMA minor
# dims must be 128-aligned), with zero alignment slack.  Must be 128.
SPAN_ALIGN = 128


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
    skin: jax.Array     # [T]    max per-particle drift bound (0 = live)


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
    """pad_to_groups plus the matching Morton codes — [N] uint32 (30-bit)
    or [N, 2] (hi, lo) 63-bit pairs; clones of the last particle keep the
    sorted order valid."""
    n = pos_s.shape[0]
    pos_p, mass_p = pad_to_groups(pos_s, mass_s, b)
    n_pad = pos_p.shape[0]
    if n_pad == n:
        return pos_p, mass_p, codes_s
    codes_p = jnp.concatenate(
        [codes_s,
         jnp.broadcast_to(codes_s[-1], (n_pad - n,) + codes_s.shape[1:])]
    )
    return pos_p, mass_p, codes_p


def local_width(codes_s: jax.Array, box_size, b: int) -> jax.Array:
    """Per-particle LOCAL cell-width estimate from the sorted Morton
    codes (either width — [N] or [N, 2]): the depth of the smallest
    Morton cell containing the particle and its neighbor b/8 positions
    away (the child-cell occupancy scale) gives width = box_size *
    2^-depth.  Used to cap band-reuse skin margins at the local geometry
    scale — a skin much wider than the local cell width floods the band
    caps (overflow => coarse-monopole fallback => theta violations in
    the dense core)."""
    from nbody_tpu.ops.cells import lcp_between

    c = max(b // 8, 1)
    left = jnp.concatenate(
        [jnp.broadcast_to(codes_s[:1], (c,) + codes_s.shape[1:]),
         codes_s[:-c]], axis=0,
    )
    right = jnp.concatenate(
        [codes_s[c:],
         jnp.broadcast_to(codes_s[-1:], (c,) + codes_s.shape[1:])], axis=0,
    )
    d = jnp.maximum(lcp_between(codes_s, left), lcp_between(codes_s, right)) // 3
    return box_size * jnp.exp2(-d.astype(jnp.float32))


def target_subspheres(
    pos_s: jax.Array, b: int, drift: jax.Array | None = None,
    codes: jax.Array | None = None,
) -> GroupInfo:
    """Bounding spheres of each target block's SUB_FACTOR sub-blocks,
    shaped [T * SUB_FACTOR].  `drift` [N] attaches each sub-block's max
    per-particle drift bound (band-reuse skin).

    With `codes` (the block's sorted Morton codes), the SUB_FACTOR-1
    internal boundaries are placed at the block's DEEPEST Morton seams
    (smallest adjacent-LCP) instead of fixed b/8 strides.  Fixed strides
    leave "Morton-seam blocks" — a sub-block whose run straddles an
    octant boundary gets a near-domain-sized sphere that poisons the
    min-gap MAC for the whole target (measured at 1M: 1.8% of targets,
    near-band demand pinned at cap).  Seam-aligned segments bound each
    side of every major seam separately, so each sphere is a tight
    cluster.  Either way the segments partition the block, so the
    min-gap bound stays conservative for every member particle."""
    t = pos_s.shape[0] // b
    if codes is None:
        sb = b // SUB_FACTOR
        p3 = pos_s.reshape(-1, sb, 3)
        lo = jnp.min(p3, axis=1)
        hi = jnp.max(p3, axis=1)
        if drift is None:
            skin = jnp.zeros((p3.shape[0],), jnp.float32)
        else:
            skin = jnp.max(drift.reshape(-1, sb), axis=1)
        return GroupInfo(
            center=0.5 * (lo + hi),
            radius=0.5 * jnp.linalg.norm(hi - lo, axis=1),
            skin=skin,
        )

    from nbody_tpu.ops.cells import lcp_between

    # adjacent LCP at the b-1 internal boundaries of each block
    # (boundary i separates local particles i and i+1)
    nxt = jnp.concatenate([codes[1:], codes[-1:]], axis=0)
    lcp = lcp_between(codes, nxt).reshape(t, b)[:, : b - 1]   # [t, b-1]
    # the SUB_FACTOR-1 shallowest-LCP boundaries, position-sorted; ties
    # broken toward even spacing is unnecessary — any partition is valid
    _, splits = lax.top_k(-lcp, SUB_FACTOR - 1)
    splits = jnp.sort(splits, axis=1)                         # [t, 7]
    idx = jnp.arange(b, dtype=_I32)
    seg = jnp.sum(
        (idx[None, :, None] > splits[:, None, :]).astype(_I32), axis=-1
    )                                                          # [t, b] 0..7
    one = seg[:, :, None] == jnp.arange(SUB_FACTOR, dtype=_I32)  # [t, b, 8]
    big_f = jnp.float32(3.0e38)
    p3 = pos_s.reshape(t, b, 1, 3)
    lo = jnp.min(jnp.where(one[..., None], p3, big_f), axis=1)   # [t, 8, 3]
    hi = jnp.max(jnp.where(one[..., None], p3, -big_f), axis=1)
    if drift is None:
        skin = jnp.zeros((t, SUB_FACTOR), jnp.float32)
    else:
        skin = jnp.max(
            jnp.where(one, drift.reshape(t, b, 1), 0.0), axis=1
        )
    # top_k returns distinct boundary positions, so every segment holds
    # >= 1 particle and lo <= hi always
    return GroupInfo(
        center=(0.5 * (lo + hi)).reshape(t * SUB_FACTOR, 3),
        radius=(0.5 * jnp.linalg.norm(hi - lo, axis=-1)).reshape(-1),
        skin=skin.reshape(-1),
    )


class Supers(NamedTuple):
    """Level-2/3 source aggregates.

    The same structure serves two levels: SUPERS (8 consecutive adaptive
    cells each, `make_supers`) and SUPER-SUPERS (8 consecutive supers =
    64 cells, `make_supersupers` — the top level the dense far sweep
    runs over; far_sweep_* reads exactly com/gmass/n_supers).  diam is
    the MAC size for refinement to the next level down.
    """

    com: jax.Array      # [S, 3]
    gmass: jax.Array    # [S]
    diam: jax.Array     # [S] max bbox extent over members
    lo: jax.Array       # [S, 3] member bbox lower corner (+inf if empty)
    hi: jax.Array       # [S, 3] member bbox upper corner (-inf if empty)
    skin: jax.Array     # [S] max member drift bound
    n_supers: jax.Array # [] int32 live count (ceil(n_members_live / 8))


def _aggregate8(com, gmass, lo, hi, skin, n_live):
    """Shared 8-to-1 aggregation: mass-weighted COM, bbox union, skin
    max.  Inputs are member-level arrays whose length is a multiple of 8
    (live members form a prefix; empty members carry gmass 0,
    lo=+inf/hi=-inf)."""
    s = gmass.shape[0] // 8
    gm = gmass.reshape(s, 8)
    msum = jnp.sum(gm, axis=1)
    c = jnp.sum(
        com.reshape(s, 8, 3) * gm[..., None], axis=1
    ) / jnp.maximum(msum, 1e-20)[:, None]
    alo = jnp.min(lo.reshape(s, 8, 3), axis=1)
    ahi = jnp.max(hi.reshape(s, 8, 3), axis=1)
    valid = msum > 0
    diam = jnp.where(valid, jnp.max(ahi - alo, axis=1), 0.0)
    return Supers(
        com=jnp.where(valid[:, None], c, 0.0),
        gmass=msum,
        diam=diam,
        lo=alo,
        hi=ahi,
        skin=jnp.max(skin.reshape(s, 8), axis=1),
        n_supers=(n_live + 7) // 8,
    )


def make_supers(cells) -> Supers:
    return _aggregate8(
        cells.com, cells.gmass, cells.lo, cells.hi, cells.skin,
        cells.n_cells,
    )


def make_supersupers(supers: Supers) -> Supers:
    """Level-3 aggregates: 8 consecutive supers (= 64 cells) each — the
    far sweep's source level.  The classification refines failing
    super-supers to their member supers (with an anti-SS table row), so
    the far/mid panel work per target scales with the ~S/8 super-super
    count instead of S (the O(N*S) term that quadrupled the 4M far sweep
    and classify stage 1 per 4x N — PERF.md '4M retune')."""
    s = supers.gmass.shape[0]
    s_pad = -(-s // 8) * 8
    if s_pad != s:
        pad = s_pad - s
        big_f = jnp.float32(3.0e38)
        supers = Supers(
            com=jnp.pad(supers.com, ((0, pad), (0, 0))),
            gmass=jnp.pad(supers.gmass, (0, pad)),
            diam=jnp.pad(supers.diam, (0, pad)),
            lo=jnp.pad(supers.lo, ((0, pad), (0, 0)), constant_values=big_f),
            hi=jnp.pad(supers.hi, ((0, pad), (0, 0)), constant_values=-big_f),
            skin=jnp.pad(supers.skin, (0, pad)),
            n_supers=supers.n_supers,
        )
    return _aggregate8(
        supers.com, supers.gmass, supers.lo, supers.hi, supers.skin,
        supers.n_supers,
    )


def make_ss(supers: Supers, cfg: SimConfig) -> Supers:
    """The far sweep's top source level: super-supers, or — with
    cfg.no_ss — the same aggregates with diam forced huge so every live
    SS fails its MAC and telescopes to its member supers (the anti-SS
    row cancels the far-sweep SS term; round-3 far-field semantics).
    Single entry for every build/refresh path so the single-chip and
    sharded twins stay in lockstep."""
    ss = make_supersupers(supers)
    if cfg.no_ss:
        ss = ss._replace(diam=jnp.where(ss.gmass > 0, 3.0e38, ss.diam))
    return ss


class CellBands(NamedTuple):
    """Per-target source classification over the adaptive cell hierarchy.

    ss:   super-supers failing the MAC (refine to their 8 member supers);
    sup:  supers failing the MAC (refine to their 8 member cells);
    mid:  cells failing the MAC (refine to their 8 children);
    cmid: children failing whose grandchildren all pass (refine to the 8
          grandchild monopoles);
    near: children whose grandchildren still fail — exact P2P, kept both
          as child ids (for the anti-monopole table rows) and as
          DEDUPLICATED aligned source WINDOWS (the P2P kernel's unit of
          work): each near child's contiguous particle run is split at
          SPAN_ALIGN boundaries into (window, 128-bit lane mask) pieces,
          and all pieces landing in the same window are OR-merged — one
          DMA + one masked panel per DISTINCT window, regardless of how
          many disjoint child runs it holds (runs are disjoint particle
          ranges, so the mask OR never double-counts a lane).
    """

    ss_idx: jax.Array     # [T, ss_cap] int32 super-super ids (pad: n_ss)
    ss_cnt: jax.Array
    sup_idx: jax.Array    # [T, sup_cap] int32 super ids (pad: n_sup)
    sup_cnt: jax.Array
    mid_idx: jax.Array    # [T, mid_cap] int32 cell ids (pad: g_cap)
    mid_cnt: jax.Array
    cmid_idx: jax.Array   # [T, cmid_cap] int32 child ids 8*cell+slot (pad: 8*g_cap)
    cmid_cnt: jax.Array
    near_idx: jax.Array   # [T, near_cap] int32 child ids (pad: 8*g_cap)
    near_cnt: jax.Array
    win_first: jax.Array  # [T, win_cap] int32 SPAN_ALIGN-aligned
                          # window starts in the sorted order, distinct
                          # per target, live-prefix packed (pad: 0);
                          # children past win_cap windows are dropped
                          # with their anti-rows (graceful, see
                          # _window_masks)
    win_mask: jax.Array   # [T, 4, win_cap] int32 — 128-bit lane
                          # validity mask per window (word w covers lanes
                          # [32w, 32w+32); pad windows are all-zero)
    win_cnt: jax.Array    # [T] int32 live window count
    ss_overflow: jax.Array
    sup_overflow: jax.Array
    mid_overflow: jax.Array
    cmid_overflow: jax.Array
    near_overflow: jax.Array


def _row_compact_one(key, big, cap):
    """Sort-based row compaction of one ascending-key class.

    key: [C, K] int32, `big` for absent.  Returns (idx [C, cap], cnt [C])
    with absent lanes set to `big`."""
    skey = lax.sort(key, dimension=1)
    cnt = jnp.sum((key < big).astype(_I32), axis=1)
    if cap > skey.shape[1]:
        skey = jnp.pad(skey, ((0, 0), (0, cap - skey.shape[1])), constant_values=big)
    lane = jnp.arange(cap, dtype=_I32)[None, :]
    idx = jnp.where(lane < cnt[:, None], skey[:, :cap], big)
    return idx, cnt


def _lowmask(k):
    """int32 with the low `k` bits set (k in [0, 32], vectorized)."""
    shifted = (jnp.int32(1) << jnp.clip(k, 0, 31).astype(_I32)) - 1
    return jnp.where(k >= 32, jnp.int32(-1), shifted)


def _pieces(f, cnt, p, big):
    """P aligned pieces per run: piece j holds window (f//128 + j)'s
    overlap with [f, f+cnt), as (window key, 4 lane-mask words).

    A run of `cnt` particles starting at offset off = f mod 128 touches
    ceil((off+cnt)/128) <= ceil(cnt_max/128)+1 consecutive windows, so a
    caller must size p = ceil(run_max/SPAN_ALIGN)+1 (SimConfig.
    win_pieces for near children, whose runs are bounded by force_tile —
    NOT force_tile/8: the adaptive cut bounds CELLS at force_tile
    bodies, and a degenerate octant can put nearly all of them in ONE
    child.  The original 2-piece splitter silently dropped the interior
    windows of such children — missing mass, the one error class the
    band design promises never to produce; measured at the 1M hot state
    as a theta-INDEPENDENT ~3% halo force error and a -0.13%/128-step
    secular cooling, tools/_prof_fbias*.py).

    Dead pieces (j past the run's last window) carry the run's LAST live
    window key with an all-zero mask, so for ascending disjoint runs the
    flattened [r, p*K] key sequence stays NON-DECREASING — the property
    the adjacent-dedup segmented-OR merge in both _window_masks variants
    relies on.  Dead runs (cnt == 0) key `big`.
    """
    r, k = f.shape
    w = f // SPAN_ALIGN
    off = lax.rem(f, SPAN_ALIGN)
    end = off + cnt                       # run end in window-local coords
    n_live = lax.div(end + SPAN_ALIGN - 1, jnp.int32(SPAN_ALIGN))
    key_last = w + jnp.maximum(n_live - 1, 0)
    keys = []
    words = [[] for _ in range(4)]
    for j in range(p):
        live_j = (cnt > 0) & (end > SPAN_ALIGN * j)
        kj = jnp.where(live_j, w + j,
                       jnp.where(cnt > 0, key_last, big))
        s_j = jnp.maximum(off - SPAN_ALIGN * j, 0)
        e_j = jnp.minimum(end - SPAN_ALIGN * j, SPAN_ALIGN)
        keys.append(kj)
        for m in range(4):
            words[m].append(jnp.where(
                live_j, _lowmask(e_j - 32 * m) & ~_lowmask(s_j - 32 * m), 0
            ))
    key = jnp.stack(keys, axis=-1).reshape(r, p * k)
    ms = tuple(jnp.stack(wl, axis=-1).reshape(r, p * k) for wl in words)
    return key, ms


def _window_masks_dense(first, count, win_cap: int, pieces: int = 2):
    """Full-width reference implementation of _window_masks (see there
    for the contract).  Kept as the equivalence oracle for the sliced
    production version: it processes all pieces*K piece positions
    unconditionally, which measured 63 ms/rebuild at 1M (the 5-operand
    segmented-OR scan over [C, 2*near_cap] — tools/_prof_classify.py
    "winscan") against a mean live width of ~250.
    """
    big = jnp.iinfo(jnp.int32).max // 2 * 2
    p = pieces
    r = first.shape[0]
    key, (m0, m1, m2, m3) = _pieces(first, count, p, big)     # [R, pK]
    bnd = jnp.concatenate(
        [jnp.ones_like(key[:, :1], bool), key[:, 1:] != key[:, :-1]], axis=1
    )
    # rank of each piece's window = index of its run (keys non-decreasing
    # => runs are distinct windows in order); ranks only need the keys,
    # so the win-cap child drop zeroes masks BEFORE the OR merge
    rank = jnp.cumsum(bnd.astype(_I32), axis=1) - 1           # [R, pK]
    child_rank = rank[:, p - 1::p]                            # last piece of child i
    child_live = count > 0
    child_drop = child_live & (child_rank >= win_cap)
    kept_children = jnp.sum((child_live & ~child_drop).astype(_I32), axis=1)
    dropped = jnp.any(child_drop, axis=1)
    drop_pos = jnp.repeat(child_drop, p, axis=1)              # [R, pK]
    m0, m1, m2, m3 = (jnp.where(drop_pos, 0, m) for m in (m0, m1, m2, m3))

    # segmented OR over equal-adjacent keys; the run's LAST entry
    # accumulates the full mask, then one sort packs the kept entries
    def comb(a, b):
        fa, fb = a[0], b[0]
        rest = tuple(
            jnp.where(fb, xb, xa | xb) for xa, xb in zip(a[1:], b[1:])
        )
        return (fa | fb,) + rest

    _, m0, m1, m2, m3 = lax.associative_scan(
        comb, (bnd, m0, m1, m2, m3), axis=1
    )
    last = jnp.concatenate(
        [key[:, :-1] != key[:, 1:], jnp.ones_like(key[:, :1], bool)], axis=1
    )
    keep = jnp.where(last & (key < big) & (rank < win_cap), key, big)
    keep, m0, m1, m2, m3 = lax.sort((keep, m0, m1, m2, m3), dimension=1,
                                    num_keys=1)
    keep, m0, m1, m2, m3 = (x[:, :win_cap] for x in (keep, m0, m1, m2, m3))
    live = keep < big
    win_first = jnp.where(live, keep * SPAN_ALIGN, 0)
    win_mask = jnp.stack(
        [jnp.where(live, m, 0) for m in (m0, m1, m2, m3)], axis=1
    )
    return (win_first, win_mask, jnp.sum(live.astype(_I32), axis=1),
            kept_children, dropped)


# Pieces processed per sliced-_window_masks iteration (2 per child, so
# SLICE_W/2 children); must be even.  512 balances per-iteration overhead
# against wasted tail work: mean live pieces at the 1M bench state are
# ~250 of the 2*near_cap = 2048 static width.
_WIN_SLICE_W = 512


def _window_masks(first, count, win_cap: int, pieces: int = 2):
    """Convert near-child runs to deduplicated (aligned window, 128-bit
    mask) pairs, capped at win_cap DISTINCT windows per row.

    `pieces` bounds the windows one run can touch: ceil(run_max/128)+1
    (SimConfig.win_pieces — near-child runs are bounded by force_tile,
    see _pieces; 2 covers runs <= 128 only).

    first, count: [R, K] int32 child runs in ASCENDING, DISJOINT particle
    order (live-prefix packed; pad entries count == 0 at the end) — the
    order _row_compact_two guarantees.  Returns (win_first [R, win_cap]
    aligned starts, win_mask [R, 4, win_cap] lane-validity words,
    win_cnt [R], kept_children [R], dropped [R] bool) with live windows
    packed first and DISTINCT per row: pieces sharing a window OR their
    masks into one entry.  Runs are disjoint particle ranges, so the OR
    never double-counts a lane.

    WIN CAP SEMANTICS (graceful): window ranks are monotone in child
    order, so the children whose windows exceed win_cap form a SUFFIX of
    the near list.  Those children are dropped WHOLLY — their pieces'
    masks are zeroed BEFORE the OR merge and the caller must drop the
    same children's anti-rows (truncate near_cnt to kept_children), so a
    dropped child simply keeps its own child monopole: a local theta
    violation, never a missing or double-counted force.

    Structure exploited (saves a full [R, 2K] multi-array sort): a run
    splits at its single SPAN_ALIGN boundary, so piece 2's window is
    always piece 1's + 1, and with runs ascending the INTERLEAVED key
    sequence [w_0, w_0+1, w_1, w_1+1, ...] is non-decreasing (if run i
    crossed a boundary, run i+1 starts past it, so w_{i+1} >= w_i + 1; a
    dead piece 2 takes its own run's w_i as a zero-mask duplicate).
    Equal windows are therefore already adjacent: dedup is an
    adjacent-compare + segmented OR, and only the final PACK pays a sort.

    SLICED EXECUTION: the segmented-OR scan is the single most expensive
    stage of the whole rebuild at full width (63 ms of the 282 ms
    1M rebuild — tools/_prof_classify.py), yet live pieces are a PREFIX
    of mean length ~250 vs the 2*near_cap = 2048 static width.  A
    while_loop therefore processes _WIN_SLICE_W pieces at a time, only up
    to the rightmost live child in the batch, carrying the open window
    (key + accumulated mask words + rank) across slice boundaries; the
    tail slices of the static cap are never touched.  Outputs are written
    in place per slice and packed by the same final sort, which measures
    FREE in situ (XLA fuses it — winsort vs winscan in the profiler).
    """
    big = jnp.iinfo(jnp.int32).max // 2 * 2
    p = pieces
    r, k = first.shape
    cw = max(1, _WIN_SLICE_W // p)          # children per slice
    sw = cw * p                             # piece positions per slice
    k_pad = -(-k // cw) * cw
    if k_pad != k:
        first = jnp.pad(first, ((0, 0), (0, k_pad - k)))
        count = jnp.pad(count, ((0, 0), (0, k_pad - k)))
    n_slices = k_pad // cw
    w_out = n_slices * sw + 1               # +1: final-carry flush slot
    # rightmost live child (robust even if liveness were not a prefix)
    child_pos = jnp.arange(k_pad, dtype=_I32)[None, :]
    last_live = jnp.max(jnp.where(count > 0, child_pos + 1, 0))
    trip = (last_live + cw - 1) // cw

    def comb(a, b):
        fa, fb = a[0], b[0]
        rest = tuple(
            jnp.where(fb, xb, xa | xb) for xa, xb in zip(a[1:], b[1:])
        )
        return (fa | fb,) + rest

    def body(c):
        (s, okey, o0, o1, o2, o3,
         pkey, p0, p1, p2, p3, prank, kept, drop) = c
        f = lax.dynamic_slice(first, (0, s * cw), (r, cw))
        cnt = lax.dynamic_slice(count, (0, s * cw), (r, cw))
        key, m = _pieces(f, cnt, p, big)    # [r, sw]
        m = list(m)
        bnd = jnp.concatenate(
            [key[:, :1] != pkey[:, None], key[:, 1:] != key[:, :-1]], axis=1
        )
        rank = prank[:, None] + jnp.cumsum(bnd.astype(_I32), axis=1)
        child_rank = rank[:, p - 1::p]
        child_live = cnt > 0
        child_drop = child_live & (child_rank >= win_cap)
        kept = kept + jnp.sum((child_live & ~child_drop).astype(_I32), axis=1)
        drop = drop | jnp.any(child_drop, axis=1)
        drop_pos = jnp.repeat(child_drop, p, axis=1)
        m = [jnp.where(drop_pos, 0, x) for x in m]
        # the open carry window continues into position 0 when keys match
        cont = ~bnd[:, :1]
        m = [
            jnp.concatenate(
                [x[:, :1] | jnp.where(cont, p[:, None], 0), x[:, 1:]], axis=1
            )
            for x, p in zip(m, (p0, p1, p2, p3))
        ]
        _, a0, a1, a2, a3 = lax.associative_scan(
            comb, (bnd, m[0], m[1], m[2], m[3]), axis=1
        )
        # within-slice window-last positions; the slice's final position
        # is never "last" here — it becomes the next carry.  The CARRIED
        # window is emitted in this slice's leading block column when NOT
        # continued (that column aliases the previous slice's final
        # position, which was always written big) — otherwise a window
        # ending exactly at a slice boundary would be lost.
        last = jnp.concatenate(
            [key[:, :-1] != key[:, 1:],
             jnp.zeros_like(key[:, :1], bool)], axis=1
        )
        keep = jnp.where(last & (key < big) & (rank < win_cap), key, big)
        emit0 = jnp.where(
            (~cont[:, 0]) & (pkey >= 0) & (pkey < big) & (prank < win_cap),
            pkey, big,
        )
        # block layout: [carry emit | this slice's W positions], written
        # at column s*W — block[0] aliases the PREVIOUS slice's final
        # position (always written big), so each window is emitted exactly
        # once: at its in-slice last position, in the next slice's leading
        # column, or by the post-loop flush
        blk_key = jnp.concatenate([emit0[:, None], keep], axis=1)
        blk = [jnp.concatenate([p[:, None], a], axis=1)
               for p, a in zip((p0, p1, p2, p3), (a0, a1, a2, a3))]
        col = s * sw
        okey = lax.dynamic_update_slice(okey, blk_key, (0, col))
        o0 = lax.dynamic_update_slice(o0, blk[0], (0, col))
        o1 = lax.dynamic_update_slice(o1, blk[1], (0, col))
        o2 = lax.dynamic_update_slice(o2, blk[2], (0, col))
        o3 = lax.dynamic_update_slice(o3, blk[3], (0, col))
        return (s + 1, okey, o0, o1, o2, o3,
                key[:, -1], a0[:, -1], a1[:, -1], a2[:, -1], a3[:, -1],
                rank[:, -1], kept, drop)

    init = (
        jnp.int32(0),
        jnp.full((r, w_out), big, _I32),
        jnp.zeros((r, w_out), _I32), jnp.zeros((r, w_out), _I32),
        jnp.zeros((r, w_out), _I32), jnp.zeros((r, w_out), _I32),
        jnp.full((r,), -1, _I32),
        jnp.zeros((r,), _I32), jnp.zeros((r,), _I32),
        jnp.zeros((r,), _I32), jnp.zeros((r,), _I32),
        jnp.full((r,), -1, _I32),
        jnp.zeros((r,), _I32), jnp.zeros((r,), bool),
    )
    (s_done, okey, o0, o1, o2, o3,
     pkey, p0, p1, p2, p3, prank, kept_children, dropped) = lax.while_loop(
        lambda c: c[0] < trip, body, init
    )
    # flush the final open window at the column after the last processed
    # slice's block (that slice's final position, always written big)
    fk = jnp.where(
        (pkey >= 0) & (pkey < big) & (prank < win_cap), pkey, big
    )
    col = s_done * sw
    okey = lax.dynamic_update_slice(okey, fk[:, None], (0, col))
    o0 = lax.dynamic_update_slice(o0, p0[:, None], (0, col))
    o1 = lax.dynamic_update_slice(o1, p1[:, None], (0, col))
    o2 = lax.dynamic_update_slice(o2, p2[:, None], (0, col))
    o3 = lax.dynamic_update_slice(o3, p3[:, None], (0, col))
    okey, o0, o1, o2, o3 = lax.sort((okey, o0, o1, o2, o3), dimension=1,
                                    num_keys=1)
    out_cap = min(win_cap, p * k)   # match the dense version's width
    okey, o0, o1, o2, o3 = (x[:, :out_cap] for x in (okey, o0, o1, o2, o3))
    live = okey < big
    win_first = jnp.where(live, okey * SPAN_ALIGN, 0)
    win_mask = jnp.stack(
        [jnp.where(live, x, 0) for x in (o0, o1, o2, o3)], axis=1
    )
    return (win_first, win_mask, jnp.sum(live.astype(_I32), axis=1),
            kept_children, dropped)


def _row_compact_two(key_lo, key_hi, big, cap_lo, cap_hi):
    """Sort-based row compaction of two disjoint ascending-key classes.

    key_lo/key_hi: [C, K] int32 keys, `big` for absent.  Returns
    (lo_idx, lo_cnt, hi_idx, hi_cnt) with hi keys de-offset by `big//2`.
    Each class gets its OWN packing sort: the earlier merged-sort variant
    extracted the hi class at a dynamic row offset with take_along_axis —
    a ~9 ns/element gather that dominated the whole classification stage
    once cap_hi grew to the demand-sized near cap (measured +37 ms at
    1M).  (Scatter-based compaction measured ~6x slower still.)
    """
    def one(key, cap):
        skey = lax.sort(key, dimension=1)
        cnt = jnp.sum((key < big).astype(_I32), axis=1)
        if cap > skey.shape[1]:
            skey = jnp.pad(skey, ((0, 0), (0, cap - skey.shape[1])),
                           constant_values=big)
        lane = jnp.arange(cap, dtype=_I32)[None, :]
        idx = jnp.where(lane < cnt[:, None], skey[:, :cap], big)
        return idx, cnt

    lo_idx, lo_cnt = one(key_lo, cap_lo)
    hi_idx, hi_cnt = one(key_hi, cap_hi)
    hi_idx = jnp.where(hi_idx < big, hi_idx - big // 2, big)
    return lo_idx, lo_cnt, hi_idx, hi_cnt


def cell_band_lists(
    tgt_subs: GroupInfo, ss: Supers, supers: Supers, cells, cfg: SimConfig,
    skin=0.0,
) -> CellBands:
    """Four-stage classification, chunked over targets.

    Stage 0 tests every SUPER-SUPER (the ~S/8 level-3 aggregates — the
    only dense panel over all sources) against the target's sub-spheres
    (min gap); failing super-supers are listed.  Stage 1 gathers only the
    failing super-supers' member supers (live-gated slices); failing
    supers are listed.  Stage 2 gathers only the failing supers' cells
    (live-gated); failing cells are listed (mid).  Stage 3 tests the
    failing cells' 8 children each: a failing child is refined to its
    grandchild monopoles if those pass (cmid) or marked for exact P2P
    (near); near child runs are then converted to deduplicated aligned
    windows with lane masks (_window_masks).

    `skin` is a conservative UNIFORM margin for band REUSE across steps;
    per-entity skins (cells.skin / child_skin / supers.skin / the target
    sub-spheres' skin, from a per-particle drift array) compose with it.
    Every MAC becomes
        (diam + 2*(src_skin + skin/2))
          / dist(max(gap - (src_skin + skin/2) - (tgt_skin + skin/2), 0))
        < theta
    so the classification stays valid while every particle moves by at
    most its own drift bound (+ skin/2 uniformly).  `skin` may be a
    traced scalar.
    """
    ss_cap, s_cap = cfg.ss_cap, cfg.sup_cap
    mid_cap, cmid_cap, near_cap = cfg.mid_cap, cfg.cmid_cap, cfg.near_cap
    theta = cfg.theta
    soft = soft_term(cfg)
    n_ss = ss.com.shape[0]
    n_sup = supers.com.shape[0]
    g_cap = cells.gmass.shape[0]
    k_cap = 8 * g_cap
    t = tgt_subs.center.shape[0] // SUB_FACTOR
    big = jnp.iinfo(jnp.int32).max // 2 * 2  # even sentinel
    half = 0.5 * jnp.asarray(skin, jnp.float32)

    # packed per-super fields for stage 1, grouped by SUPER-SUPER so one
    # row gather fetches all 8 member supers: [n_ss+1, 8, 6] (zero pad
    # row; gmass rides along so empty members never fail the MAC)
    sup_pad8 = 8 * n_ss
    supf = jnp.concatenate(
        [supers.com, supers.diam[:, None], supers.skin[:, None],
         supers.gmass[:, None]], axis=1,
    )
    if sup_pad8 != n_sup:
        supf = jnp.pad(supf, ((0, sup_pad8 - n_sup), (0, 0)))
    supf8 = jnp.concatenate(
        [supf.reshape(n_ss, 8, 6), jnp.zeros((1, 8, 6), jnp.float32)]
    )

    # packed per-cell fields for stage 2, grouped by SUPER so one row
    # gather fetches all 8 member cells: [n_sup+1, 8, 5] (zero pad row)
    cellf = jnp.concatenate(
        [cells.com, cells.diam[:, None], cells.skin[:, None]], axis=1
    )
    cellf8 = jnp.concatenate(
        [cellf.reshape(n_sup, 8, 5), jnp.zeros((1, 8, 5), jnp.float32)]
    )

    # packed per-child fields for stage 3: [g_cap+1, 8, 14] (zero pad row):
    # com(3), diam, gchild_diam_max, gc-COM box lo(3), hi(3), gmass, skin,
    # gchild_complete.  The grandchild-acceptance bound needs "closest
    # possible grandchild COM"; their bounding box is a tight-and-correct
    # bound.  `gchild_complete` gates grandchild refinement: a child whose
    # grandchild segments overflowed the c2 cap has some of them dropped,
    # so its grandchild monopoles no longer telescope to the child mass —
    # it must take the exact P2P path instead (cells.SourceCells).
    gc_ok = cells.gchild_gmass > 0
    big_f = jnp.float32(3.0e38)
    gc_lo = jnp.min(jnp.where(gc_ok[..., None], cells.gchild_com, big_f), axis=2)
    gc_hi = jnp.max(jnp.where(gc_ok[..., None], cells.gchild_com, -big_f), axis=2)
    kidf = jnp.concatenate(
        [cells.child_com, cells.child_diam[..., None],
         cells.gchild_diam_max[..., None], gc_lo, gc_hi,
         cells.child_gmass[..., None], cells.child_skin[..., None],
         cells.gchild_complete.astype(jnp.float32)[..., None]], axis=-1
    )                                                       # [Gc, 8, 14]
    kidf = jnp.concatenate([kidf, jnp.zeros((1, 8, 14), jnp.float32)])

    # flat per-child spans for the near band, PACKED two-wide so the
    # near-list fetch is one row gather (~4.4 ns/row) instead of two
    # element gathers (~9.3 ns/elem — measured 2x37 ms at 1M for the
    # [T, near_cap] fetch, the single largest classify cost): [8g+1, 2]
    fc_flat = jnp.concatenate([
        jnp.stack([cells.child_first.reshape(-1),
                   cells.child_count.reshape(-1)], axis=1),
        jnp.zeros((1, 2), _I32),
    ])

    centers = tgt_subs.center.reshape(t, SUB_FACTOR, 3)
    radii = tgt_subs.radius.reshape(t, SUB_FACTOR)
    tskins = tgt_subs.skin.reshape(t, SUB_FACTOR)
    # chunk rows so the per-chunk panel working set stays bounded; the
    # stage-0 intermediates are ~24*n_ss floats per row, the gated
    # stage-1/2 key arrays ~8*(ss_cap + sup_cap) ints, stage 3
    # ~30*8*mid_cap (caps are tunable, so the budget must track them)
    per_row = 24 * n_ss + 120 * ss_cap + 120 * s_cap + 250 * mid_cap
    chunk = max(8, min(256, (28 << 20) // max(per_row, 1)))
    t_pad = -(-t // chunk) * chunk
    centers = jnp.pad(centers, ((0, t_pad - t), (0, 0), (0, 0)))
    radii = jnp.pad(radii, ((0, t_pad - t), (0, 0)))
    tskins = jnp.pad(tskins, ((0, t_pad - t), (0, 0)))
    # mask: which rows of each chunk are REAL targets (padding rows sit at
    # the origin and would otherwise trip the overflow flags)
    row_real = (jnp.arange(t_pad, dtype=_I32) < t).reshape(-1, chunk)

    ss_ids = jnp.arange(n_ss, dtype=_I32)[None, :]
    arange8 = jnp.arange(8, dtype=_I32)

    def one_chunk(args):
        ctr, rad, tsk, real = args           # [C,S,3],[C,S],[C,S],[C]
        c_rows = ctr.shape[0]
        # effective sub-sphere deflation: target drift + uniform half-skin
        rad_t = rad + tsk + half             # [C, S]

        def sub_gap(com, src_skin):
            # com [C, K, 3] per-row sources, src_skin [C, K] per-row
            # source drift -> skin-deflated min gap over sub-spheres [C, K]
            d = com[:, :, None, :] - ctr[:, None, :, :]
            gap = jnp.sqrt(jnp.sum(d * d, axis=-1)) - rad_t[:, None, :]
            gap = jnp.maximum(jnp.min(gap, axis=-1), 0.0)
            return jnp.maximum(gap - (src_skin + half), 0.0)

        def gated_mac(idx_list, cnt_raw, cap, pack, n_rows, id_cap, sl):
            """Live-gated child-of-listed-parent MAC: a while_loop tests
            `sl` listed parents (8 members each) per iteration up to the
            chunk's live maximum, writing failing member ids into a
            big-initialized key array.  pack [n_rows+1, 8, F] carries
            (com3, diam, skin, gmass) per member; members with zero gmass
            (empty / structural pad) never fail.  Returns the key array
            [C, cap_pad*8] for _row_compact_one."""
            cap_pad = -(-cap // sl) * sl
            ids = jnp.minimum(idx_list, n_rows)        # pad -> zero row
            if cap_pad != cap:
                ids = jnp.pad(ids, ((0, 0), (0, cap_pad - cap)),
                              constant_values=n_rows)
            trip = lax.div(jnp.max(jnp.minimum(cnt_raw, cap)) + sl - 1,
                           jnp.int32(sl))

            def body(s):
                i, keys = s
                psl = lax.dynamic_slice(ids, (0, i * sl), (c_rows, sl))
                f = pack[psl].reshape(c_rows, sl * 8, 6)
                kid = (psl[:, :, None] * 8
                       + arange8[None, None, :]).reshape(c_rows, -1)
                sk = f[..., 4] + half
                dist = jnp.sqrt(sub_gap(f[..., 0:3], f[..., 4]) ** 2 + soft)
                fail = (((f[..., 3] + 2.0 * sk) / dist >= theta)
                        & (f[..., 5] > 0) & (kid < id_cap))
                keys = lax.dynamic_update_slice(
                    keys, jnp.where(fail, kid, big), (0, i * sl * 8)
                )
                return i + 1, keys

            key_init = jnp.full((c_rows, cap_pad * 8), big, _I32)
            _, keys = lax.while_loop(lambda s: s[0] < trip, body,
                                     (jnp.int32(0), key_init))
            return keys

        # stage 0: super-supers — the only dense panel over all sources
        d = ss.com[None, :, None, :] - ctr[:, None, :, :]
        gap = jnp.sqrt(jnp.sum(d * d, axis=-1)) - rad_t[:, None, :]
        sssk = ss.skin[None, :] + half
        gap = jnp.maximum(jnp.maximum(jnp.min(gap, axis=-1), 0.0) - sssk, 0.0)
        dist = jnp.sqrt(gap * gap + soft)
        fail0 = ((ss.diam[None, :] + 2.0 * sssk) / dist >= theta) & (
            ss.gmass > 0
        )[None, :]
        ss_idx, ss_cnt = _row_compact_one(
            jnp.where(fail0, ss_ids, big), big, ss_cap
        )

        # stage 1: the failing super-supers' member supers (live-gated)
        key1 = gated_mac(ss_idx, ss_cnt, ss_cap, supf8, n_ss, sup_pad8,
                         sl=16)
        sup_idx, sup_cnt = _row_compact_one(key1, big, s_cap)

        # stage 2: the failing supers' cells (live-gated).  Cell-as-
        # monopole test: distance to the cell's own COM (the reference's
        # criterion, nbody_v5.cu:232), conservative over the target's
        # members via its sub-spheres.  cellf8 lacks a gmass lane (5
        # fields), so pad it on the fly is avoided by reusing the 6-field
        # contract: empty cells have diam 0 AND skin 0, but a uniform
        # half > 0 could still list them — matching the historical dense
        # semantics, stage 3's own gmass gate drops their children.
        cellf6 = jnp.concatenate(
            [cellf8, jnp.ones(cellf8.shape[:2] + (1,), jnp.float32)],
            axis=-1,
        )
        key2 = gated_mac(sup_idx, sup_cnt, s_cap, cellf6, n_sup, g_cap,
                         sl=16)
        mid_idx, mc_raw = _row_compact_one(key2, big, mid_cap)

        # stage 3: the failing cells' children, each tested on its own
        # monopole; failing children refine to grandchildren (cmid) if the
        # gc-COM-box bound passes, else exact P2P (near).  LIVE-GATED: the
        # mid list is live-prefix packed, so a while_loop processes SL3
        # cells (8*SL3 children) at a time up to the chunk's live maximum
        # — the kidf row gather and the child panel (the costliest
        # classify compute) follow demand instead of the static mid_cap
        # (mean mid_cnt ~60 vs the 320 cap at 1M); untouched slices keep
        # the `big` key init, exactly what the full-width math produces
        # for pad cells.
        midc = jnp.minimum(mid_idx, g_cap)                 # pad -> g_cap
        sl3 = 32
        mid_pad = -(-mid_cap // sl3) * sl3
        if mid_pad != mid_cap:
            midc = jnp.pad(midc, ((0, 0), (0, mid_pad - mid_cap)),
                           constant_values=g_cap)
        trip3 = lax.div(jnp.max(jnp.minimum(mc_raw, mid_cap)) + sl3 - 1,
                        jnp.int32(sl3))

        def stage3_slice(s):
            i, kc, kn = s
            msl = lax.dynamic_slice(midc, (0, i * sl3), (c_rows, sl3))
            kf = kidf[msl].reshape(c_rows, sl3 * 8, 14)
            kid_id = (msl[:, :, None] * 8 + arange8[None, None, :]).reshape(
                c_rows, -1
            )                                              # pad -> >= k_cap
            ksk = kf[..., 12] + half
            distk = jnp.sqrt(sub_gap(kf[..., 0:3], kf[..., 12]) ** 2 + soft)
            live = (kf[..., 11] > 0) & (kid_id < k_cap)
            failk = ((kf[..., 3] + 2.0 * ksk) / distk >= theta) & live
            blo = kf[..., 5:8]
            bhi = kf[..., 8:11]
            cl = jnp.clip(ctr[:, None, :, :], blo[:, :, None, :],
                          bhi[:, :, None, :])
            gap_box = (jnp.linalg.norm(cl - ctr[:, None, :, :], axis=-1)
                       - rad_t[:, None, :])
            gap_box = jnp.maximum(
                jnp.maximum(jnp.min(gap_box, axis=-1), 0.0) - ksk, 0.0
            )
            dist_box = jnp.sqrt(gap_box * gap_box + soft)
            cmid_m = (
                failk
                & ((kf[..., 4] + 2.0 * ksk) / dist_box < theta)
                & (kf[..., 13] > 0.5)   # grandchild segments complete
            )
            near_m = failk & ~cmid_m
            kcs = jnp.where(cmid_m, kid_id, big)
            kns = jnp.where(near_m, kid_id + big // 2, big)
            kc = lax.dynamic_update_slice(kc, kcs, (0, i * sl3 * 8))
            kn = lax.dynamic_update_slice(kn, kns, (0, i * sl3 * 8))
            return i + 1, kc, kn

        key_init = jnp.full((c_rows, mid_pad * 8), big, _I32)
        _, key_c, key_n = lax.while_loop(
            lambda s: s[0] < trip3, stage3_slice,
            (jnp.int32(0), key_init, key_init),
        )
        ci, cc, ni, nc = _row_compact_two(key_c, key_n, big, cmid_cap, near_cap)

        # near windows: each child's contiguous run splits at its single
        # SPAN_ALIGN boundary into <= 2 pieces, converted to per-window
        # 128-bit lane masks with same-window pieces OR-merged: the P2P
        # kernel DMAs each DISTINCT window once.  near_idx is ascending
        # (_row_compact_two), so child runs arrive in the ascending
        # disjoint order _window_masks exploits.  Children whose windows
        # exceed cfg.win_cap are dropped as a SUFFIX together with their
        # anti-rows (near count truncated to kept, ids -> pad): they keep
        # their own child monopole — graceful, flagged as near overflow.
        ni_safe = jnp.minimum(ni, k_cap)
        fc = fc_flat[ni_safe]                              # [C, near_cap, 2]
        sf, scnt = fc[..., 0], fc[..., 1]
        wf, wm, win_cnt, kept, dropped = _window_masks(
            sf, scnt, cfg.win_cap_eff, pieces=cfg.win_pieces
        )
        nc_k = jnp.minimum(jnp.minimum(nc, near_cap), kept)
        lane_n = jnp.arange(near_cap, dtype=_I32)[None, :]
        ni_safe = jnp.where(lane_n < nc_k[:, None], ni_safe, k_cap)

        return (
            jnp.minimum(ss_idx, n_ss), jnp.minimum(ss_cnt, ss_cap),
            jnp.minimum(sup_idx, n_sup), jnp.minimum(sup_cnt, s_cap),
            jnp.minimum(mid_idx, g_cap), jnp.minimum(mc_raw, mid_cap),
            jnp.minimum(ci, k_cap), jnp.minimum(cc, cmid_cap),
            ni_safe, nc_k,
            wf, wm, win_cnt,
            jnp.any(real & (ss_cnt > ss_cap)),
            jnp.any(real & (sup_cnt > s_cap)),
            jnp.any(real & (mc_raw > mid_cap)),
            jnp.any(real & (cc > cmid_cap)),
            jnp.any(real & ((nc > near_cap) | dropped)),
        )

    res = lax.map(
        one_chunk,
        (centers.reshape(-1, chunk, SUB_FACTOR, 3),
         radii.reshape(-1, chunk, SUB_FACTOR),
         tskins.reshape(-1, chunk, SUB_FACTOR),
         row_real),
    )
    (ssi, ssc, si, sc, mi, mc, ci, cc, ni, nc, sf, scnt, spc,
     sso, so, mo, co, no) = res
    return CellBands(
        ss_idx=ssi.reshape(t_pad, ss_cap)[:t],
        ss_cnt=ssc.reshape(t_pad)[:t],
        sup_idx=si.reshape(t_pad, s_cap)[:t],
        sup_cnt=sc.reshape(t_pad)[:t],
        mid_idx=mi.reshape(t_pad, mid_cap)[:t],
        mid_cnt=mc.reshape(t_pad)[:t],
        cmid_idx=ci.reshape(t_pad, cmid_cap)[:t],
        cmid_cnt=cc.reshape(t_pad)[:t],
        near_idx=ni.reshape(t_pad, near_cap)[:t],
        near_cnt=nc.reshape(t_pad)[:t],
        win_first=sf.reshape(t_pad, cfg.win_cap_eff)[:t],
        win_mask=scnt.reshape(t_pad, 4, cfg.win_cap_eff)[:t],
        win_cnt=spc.reshape(t_pad)[:t],
        ss_overflow=jnp.any(sso),
        sup_overflow=jnp.any(so),
        mid_overflow=jnp.any(mo),
        cmid_overflow=jnp.any(co),
        near_overflow=jnp.any(no),
    )


class TableSet(NamedTuple):
    """Per-target band tables with live-row counts, stored PLANAR.

    tx/ty/tz/tm: [T, R] with R = near_cap + (sup_cap+mid_cap+cmid_cap)*9;
    row layout is [near anti rows (static near_cap region, valid-prefix)
    | COMPACTED 9-row monopole items].  Rows past row_cnt are all zero,
    so a sweep may stop after ceil(row_cnt / chunk) chunks — the Pallas
    table kernel does exactly that (the jnp twin sweeps everything; zero
    rows contribute nothing).

    Planar because a [T, R, 4] array gets the TPU (8,128) tile on its
    LAST TWO dims — the minor dim 4 pads to 128 lanes, a 32x memory
    expansion (12 GB at N=1M; the single-chip 4M blocker).  Four [T, R]
    planes tile perfectly."""

    tx: jax.Array        # [T, R] source x
    ty: jax.Array        # [T, R] source y
    tz: jax.Array        # [T, R] source z
    tm: jax.Array        # [T, R] G * mass (negated for anti rows)
    row_cnt: jax.Array   # [T] int32 live rows (near_cap + 9 * items —
                         #   counts the STATIC near region fully)
    near_cnt: jax.Array  # [T] int32 live prefix of the near anti region
                         #   (the Pallas sweep skips the dead gap between
                         #   near_cnt and near_cap)


def build_cell_tables(
    cells, supers: Supers, ss: Supers, bands: CellBands
) -> TableSet:
    """Per-target source tables (see TableSet).

    Row layout [x, y, z, G*mass]:
      * each NEAR child contributes its negated self — its exact P2P
        comes from the span kernel (first table region);
      * each failing SUPER-SUPER contributes a 9-row item: its 8 member-
        super monopoles plus the SS monopole with negated mass (the far
        sweep added it);
      * each failing SUPER: its 8 member-cell monopoles plus itself
        negated (band D added the super monopole);
      * each failing CELL (mid): its 8 child monopoles plus itself
        negated (band A added the cell monopole);
      * each CMID child: its 8 grandchild monopoles plus itself negated
        (band B added the child monopole).
    The four item classes are PACKED to the front of the item region
    (one row sort per target), so live rows are a prefix and the sweep
    kernel skips all-padding chunks.  Padding ids resolve to all-zero
    rows, so every band telescopes to net-zero mass beyond its
    refinement.
    """
    g_cap = cells.gmass.shape[0]
    k_cap = 8 * g_cap
    n_sup = supers.com.shape[0]
    n_ss = ss.com.shape[0]
    t = bands.sup_idx.shape[0]
    big = jnp.iinfo(jnp.int32).max

    sup4 = jnp.concatenate([supers.com, supers.gmass[:, None]], axis=1)
    if 8 * n_ss != n_sup:
        sup4 = jnp.pad(sup4, ((0, 8 * n_ss - n_sup), (0, 0)))
    extD = jnp.concatenate(
        [sup4.reshape(n_ss, 8, 4),
         jnp.concatenate([ss.com, -ss.gmass[:, None]], axis=1)[:, None, :]],
        axis=1,
    ).reshape(n_ss, 36)
    extD = jnp.concatenate([extD, jnp.zeros((1, 36), jnp.float32)])

    cell4 = jnp.concatenate([cells.com, cells.gmass[:, None]], axis=1)
    extA = jnp.concatenate(
        [cell4.reshape(n_sup, 8, 4),
         jnp.concatenate([supers.com, -supers.gmass[:, None]], axis=1)[:, None, :]],
        axis=1,
    ).reshape(n_sup, 36)
    extA = jnp.concatenate([extA, jnp.zeros((1, 36), jnp.float32)])

    child4 = jnp.concatenate(
        [cells.child_com, cells.child_gmass[..., None]], axis=-1
    )                                                       # [g_cap, 8, 4]
    extB = jnp.concatenate(
        [child4, jnp.concatenate([cells.com, -cells.gmass[:, None]], axis=1)[:, None, :]],
        axis=1,
    ).reshape(g_cap, 36)
    extB = jnp.concatenate([extB, jnp.zeros((1, 36), jnp.float32)])

    gc4 = jnp.concatenate(
        [cells.gchild_com, cells.gchild_gmass[..., None]], axis=-1
    ).reshape(k_cap, 8, 4)
    anti_child = jnp.concatenate(
        [child4[..., 0:3], -child4[..., 3:4]], axis=-1
    ).reshape(k_cap, 4)
    extC = jnp.concatenate([gc4, anti_child[:, None, :]], axis=1).reshape(k_cap, 36)
    extC = jnp.concatenate([extC, jnp.zeros((1, 36), jnp.float32)])

    # unified item table: [extD | extA | extB | extC] with each class's
    # zero pad row preserved; per-class ids offset into it
    ext_all = jnp.concatenate([extD, extA, extB, extC], axis=0)
    off_a = n_ss + 1
    off_b = off_a + n_sup + 1
    off_c = off_b + g_cap + 1
    idd = jnp.minimum(bands.ss_idx, n_ss)             # pad -> extD zero row
    ia = jnp.minimum(bands.sup_idx, n_sup) + off_a    # pad -> extA zero row
    ib = jnp.minimum(bands.mid_idx, g_cap) + off_b    # pad -> extB zero row
    ic = jnp.minimum(bands.cmid_idx, k_cap) + off_c   # pad -> extC zero row
    items = jnp.concatenate([idd, ia, ib, ic], axis=1)  # [T, K]
    vd = jnp.arange(idd.shape[1], dtype=_I32)[None, :] < bands.ss_cnt[:, None]
    va = jnp.arange(ia.shape[1], dtype=_I32)[None, :] < bands.sup_cnt[:, None]
    vb = jnp.arange(ib.shape[1], dtype=_I32)[None, :] < bands.mid_cnt[:, None]
    vc = jnp.arange(ic.shape[1], dtype=_I32)[None, :] < bands.cmid_cnt[:, None]
    valid = jnp.concatenate([vd, va, vb, vc], axis=1)
    # pack live items first (stable: key = lane where valid, big where not;
    # invalid items already point at zero rows)
    key = jnp.where(valid, jnp.arange(items.shape[1], dtype=_I32)[None, :], big)
    _, items = lax.sort((key, items), dimension=1, num_keys=1)
    antiN = jnp.concatenate([anti_child, jnp.zeros((1, 4), jnp.float32)])

    # 36-float-row gathers, then strided component extraction into PLANAR
    # [T, 9K] planes (a [T, R, 4] result would lane-pad 4->128: 32x
    # memory — see TableSet).  Both gathers are CHUNKED over targets and
    # LIVE-GATED over their row axes: items and near ids are live-prefix
    # packed with pads resolving to zero rows, so a while_loop gathers
    # only up to each chunk's live maximum and leaves the zero-initialized
    # tail untouched — row-gather cost follows demand (~180 live items +
    # ~125 near ids mean at 1M vs the 1088 + 1024 static caps), and the
    # padded [C, K, 36] transient is per-chunk, not per-T.
    k_items = items.shape[1]
    near_cap = bands.near_idx.shape[1]
    n_items = (bands.ss_cnt + bands.sup_cnt + bands.mid_cnt
               + bands.cmid_cnt).astype(_I32)
    ni_safe = jnp.minimum(bands.near_idx, k_cap)
    near_cnt = bands.near_cnt.astype(_I32)

    tc = 256
    t_pad = -(-t // tc) * tc
    if t_pad != t:
        # pad rows: all ids point at zero rows, counts 0
        items = jnp.pad(items, ((0, t_pad - t), (0, 0)))  # id 0 = extA row 0
        ni_safe = jnp.pad(ni_safe, ((0, t_pad - t), (0, 0)),
                          constant_values=k_cap)
        n_items = jnp.pad(n_items, (0, t_pad - t))
        near_cnt_p = jnp.pad(near_cnt, (0, t_pad - t))
    else:
        near_cnt_p = near_cnt
    sl_i = 128
    sl_n = 128

    def one_chunk(args):
        it, ni, cnt_i, cnt_n = args       # [C,K],[C,near_cap],[C],[C]
        c_rows = it.shape[0]

        def gated_gather(ids, table, cnt, sl):
            k = ids.shape[1]
            if k == 0:   # degenerate cap (e.g. near_cap=0): nothing to fetch
                return jnp.zeros((c_rows, 0, table.shape[1]), jnp.float32)
            sl = min(sl, k)   # small configs have fewer columns than a slice
            w = table.shape[1]
            out = jnp.zeros((c_rows, k, w), jnp.float32)
            trip = lax.div(jnp.max(cnt) + sl - 1, sl)

            def body(s):
                i, out = s
                sub = lax.dynamic_slice(ids, (0, i * sl), (c_rows, sl))
                out = lax.dynamic_update_slice(out, table[sub], (0, i * sl, 0))
                return i + 1, out

            _, out = lax.while_loop(lambda s: s[0] < trip, body,
                                    (jnp.int32(0), out))
            return out

        g36 = gated_gather(it, ext_all, cnt_i, sl_i)       # [C, K, 36]
        a4 = gated_gather(ni, antiN, cnt_n, sl_n)          # [C, near_cap, 4]

        def plane(i):
            items_i = g36[:, :, i::4].reshape(c_rows, -1)  # [C, 9K]
            return jnp.concatenate([a4[:, :, i], items_i], axis=1)

        return plane(0), plane(1), plane(2), plane(3)

    tx, ty, tz, tm = lax.map(
        one_chunk,
        (items.reshape(-1, tc, k_items),
         ni_safe.reshape(-1, tc, near_cap),
         n_items.reshape(-1, tc),
         near_cnt_p.reshape(-1, tc)),
    )
    r_tot = near_cap + 9 * k_items
    row_cnt = near_cap + 9 * (bands.ss_cnt + bands.sup_cnt + bands.mid_cnt
                              + bands.cmid_cnt)
    return TableSet(tx=tx.reshape(t_pad, r_tot)[:t],
                    ty=ty.reshape(t_pad, r_tot)[:t],
                    tz=tz.reshape(t_pad, r_tot)[:t],
                    tm=tm.reshape(t_pad, r_tot)[:t],
                    row_cnt=row_cnt.astype(_I32),
                    near_cnt=near_cnt)


def table_sweep_jnp(tgt_pos: jax.Array, tables: "TableSet", cfg: SimConfig) -> jax.Array:
    """Per-target dense sweep over the planar source tables (jnp twin of
    pallas.table_sweep_pallas)."""
    b = cfg.force_tile
    soft = soft_term(cfg)
    t = tgt_pos.shape[0] // b

    def one(args):
        pb, qx, qy, qz, qm = args             # [B,3], [S]x4
        dx = qx[None, :] - pb[:, 0:1]
        dy = qy[None, :] - pb[:, 1:2]
        dz = qz[None, :] - pb[:, 2:3]
        d2 = dx * dx + dy * dy + dz * dz
        inv = lax.rsqrt(d2 + soft)
        w = qm[None, :] * (inv * inv * inv)
        return jnp.stack(
            [jnp.sum(w * dx, axis=1), jnp.sum(w * dy, axis=1),
             jnp.sum(w * dz, axis=1)], axis=1,
        )

    acc = lax.map(
        one,
        (tgt_pos.reshape(t, b, 3), tables.tx, tables.ty, tables.tz,
         tables.tm),
    )
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
    win_first: jax.Array, win_mask: jax.Array, cfg: SimConfig,
) -> jax.Array:
    """Exact P2P against every deduplicated near window (jnp twin of the
    Pallas kernel; gathers — CPU/tests only).  The matching anti-child
    monopole rows live in the band tables, so this band is pure
    particle-particle work.

    Targets may be a slab of the global sorted order (multi-chip); the
    source particle arrays and windows are always global.  win_mask
    [T, 4, W] carries each window's 128-bit lane-validity mask.
    """
    b = cfg.force_tile
    n = tgt_pos.shape[0]
    n_src = src_pos.shape[0]
    soft = soft_term(cfg)
    tp3 = tgt_pos.reshape(-1, b, 3)
    lane = jnp.arange(SPAN_ALIGN, dtype=_I32)[None, :]   # [1, 128]
    word_ix = lane[0] // 32                              # [128]
    bit_ix = lane[0] % 32

    # live windows are PACKED FIRST (cell_band_lists/_window_masks), so
    # work through them in CH-window chunks and stop at the live count —
    # the padded tail of the static cap costs nothing (mirrors the Pallas
    # kernel's ceil(cnt/KSEG) segment loop)
    k_cap = win_first.shape[1]
    ch = min(32, k_cap)
    n_chunks = -(-k_cap // ch)
    pad = n_chunks * ch - k_cap

    def one(args):
        pb, f, m4 = args                     # [B,3], [W], [4, W]
        if pad:
            f = jnp.pad(f, (0, pad))
            m4 = jnp.pad(m4, ((0, 0), (0, pad)))
        live = (m4[0] | m4[1] | m4[2] | m4[3]) != 0
        cnt = jnp.sum(live.astype(_I32))

        def cond(s):
            i, _ = s
            return i * ch < cnt

        def body(s):
            i, acc = s
            fs = lax.dynamic_slice(f, (i * ch,), (ch,))
            ms = lax.dynamic_slice(m4, (0, i * ch), (4, ch))     # [4, ch]
            pick = jnp.clip(fs[:, None] + lane, 0, n_src - 1)    # [ch, 128]
            word = ms.T[:, word_ix]                              # [ch, 128]
            ok = ((word >> bit_ix[None, :]) & 1) == 1
            q = src_pos[pick].reshape(-1, 3)
            qm = jnp.where(ok, src_mass[pick], 0.0).reshape(-1)
            return i + 1, acc + _panel_accel(pb, q, qm, cfg.g, soft)

        _, acc = lax.while_loop(cond, body, (jnp.int32(0), jnp.zeros((b, 3), jnp.float32)))
        return acc

    acc = lax.map(one, (tp3, win_first, win_mask))
    return acc.reshape(n, 3)


def build_bands(
    pos_s: jax.Array, mass_s: jax.Array, codes_s: jax.Array, cfg: SimConfig,
    skin=0.0, drift: jax.Array | None = None,
):
    """The shared band-construction prologue of the production force path:
    adaptive cells -> supers -> super-supers -> target sub-spheres ->
    band lists -> tables.  Single source of truth for bh_forces_grouped,
    the sharded step, diagnostics, and the phase profiler.  Inputs must
    be Morton-sorted and padded to a force_tile multiple (pad_sorted).

    Returns (cells, far, bands, tables) where `far` is the TOP-LEVEL
    aggregate set the dense far sweep runs over (the super-supers) —
    exactly what apply_farmid consumes.

    `skin` (uniform scalar) and `drift` (per-particle drift bounds [N],
    aggregated to per-cell/-child/-super/-target-sub-sphere maxima) widen
    every MAC so the returned structures stay conservative while each
    particle moves up to its own drift bound + skin/2 — the basis of
    multi-step band reuse (see cell_band_lists)."""
    from nbody_tpu.ops import bbox as _bbox
    from nbody_tpu.ops.cells import build_source_cells

    b = cfg.force_tile
    # same cubified box the codes were quantized against (padding clones
    # the last particle, so min/max are unchanged)
    box_lo, box_size = _bbox.bounding_cube(pos_s)
    cells = build_source_cells(
        codes_s, pos_s, mass_s, b, cfg.g, cfg.cell_capacity, box_lo, box_size,
        drift_sorted=drift, g2_factor=cfg.g2_cap_factor,
    )
    supers = make_supers(cells)
    ss = make_ss(supers, cfg)
    tgt_subs = target_subspheres(pos_s, b, drift=drift, codes=codes_s)
    bands = cell_band_lists(tgt_subs, ss, supers, cells, cfg, skin=skin)
    tables = build_cell_tables(cells, supers, ss, bands)
    return cells, ss, bands, tables


def refresh_farmid(
    pos_live: jax.Array, mass_s: jax.Array, codes_s: jax.Array,
    drift, box_lo, box_size, bands: CellBands, cfg: SimConfig,
    tgt_pos: jax.Array | None = None,
) -> jax.Array:
    """MONOPOLE-REFRESHED far+mid evaluation at a FROZEN cut.

    Recomputes every source moment (cell/child/grandchild/super/super-
    super COMs) from LIVE positions over the frozen Morton cut (frozen
    codes => same segments; the particle order is frozen within a reuse
    cycle), regathers the band tables against the frozen classification,
    and evaluates the smooth far+mid component.  This removes the
    dominant band-reuse staleness term — frozen mid-band monopoles rotate
    ~1.3 rad per long cycle (PERF.md round-2 error decomposition;
    tools/_prof_stale.py measures the flattened staleness curves) — at
    the cost of one cells+tables rebuild per refresh (~48 ms at 1M vs
    ~150 ms for a full rebuild with sort + classification).

    What stays frozen and why it is safe: the cut and the analytic cell
    geometry (corner/width) come from the frozen codes, so `diam` no
    longer bounds live member positions exactly — the same per-entity
    skin margins that keep the frozen CLASSIFICATION conservative cover
    exactly this drift (cell_band_lists docstring); the near band is
    live on both sides and untouched.

    `tgt_pos` (default: pos_live) lets the r-RESPA hold evaluate the
    refreshed field at PREDICTED mid-window target positions (the
    second-order midpoint hold, models/simulation.py) while the source
    moments stay at live — never extrapolated — positions, so the
    skin-covered conservativeness argument for the moments is untouched."""
    from nbody_tpu.ops.cells import build_source_cells

    cells_r = build_source_cells(
        codes_s, pos_live, mass_s, cfg.force_tile, cfg.g,
        cfg.cell_capacity, box_lo, box_size, drift_sorted=drift,
        g2_factor=cfg.g2_cap_factor,
    )
    supers_r = make_supers(cells_r)
    ss_r = make_ss(supers_r, cfg)
    tables_r = build_cell_tables(cells_r, supers_r, ss_r, bands)
    if tgt_pos is None:
        tgt_pos = pos_live
    return apply_farmid(tgt_pos, ss_r, tables_r, cfg)


def bh_forces_grouped(
    pos_s: jax.Array, mass_s: jax.Array, codes_s: jax.Array, cfg: SimConfig
) -> jax.Array:
    """Production Barnes-Hut forces on Morton-sorted, block-padded arrays.

    Hierarchy: supers (8 cells) -> adaptive octree cells (<= force_tile
    bodies) -> children (depth+1 cells) -> grandchildren (depth+2).
    Telescoping bands:
      dense far sweep over all super monopoles
    + per-target tables: failing supers -> cell monopoles; failing cells
      -> child monopoles; failing children with passing grandchildren ->
      grandchild monopoles; each refinement carries an anti-row cancelling
      the coarser term
    + exact P2P spans for children whose grandchildren still fail.
    Every approximated region satisfies width/dist < theta for every
    target particle (conservative sub-sphere bound; criterion per
    nbody_v5.cu:232).
    """
    cells, supers, bands, tables = build_bands(pos_s, mass_s, codes_s, cfg)
    return apply_bands(pos_s, mass_s, supers, bands, tables, cfg)


def apply_bands(
    pos_s: jax.Array, mass_s: jax.Array, supers: Supers, bands: CellBands,
    tables: TableSet, cfg: SimConfig,
    src_pos: jax.Array | None = None, src_mass: jax.Array | None = None,
) -> jax.Array:
    """Evaluate the three force bands against (possibly frozen) band
    structures.  `src_pos`/`src_mass` default to the targets (single-chip);
    the sharded step passes the global arrays."""
    if src_pos is None:
        src_pos, src_mass = pos_s, mass_s
    return apply_farmid(pos_s, supers, tables, cfg) + apply_near(
        pos_s, src_pos, src_mass, bands, cfg
    )


def apply_farmid(
    pos_s: jax.Array, supers: Supers, tables: TableSet, cfg: SimConfig
) -> jax.Array:
    """The SMOOTH component only: far super sweep + mid band tables.
    Used by the hold_farmid force splitting (models/simulation.py), which
    freezes this component for R steps while the exact near band stays
    live."""
    if cfg.use_pallas:
        from nbody_tpu.ops.pallas.forces import (
            far_sweep_pallas, table_sweep_pallas,
        )

        return (far_sweep_pallas(pos_s, supers, cfg)
                + table_sweep_pallas(pos_s, tables, cfg))
    return far_sweep_jnp(pos_s, supers, cfg) + table_sweep_jnp(
        pos_s, tables, cfg
    )


def apply_near(
    pos_s: jax.Array, src_pos: jax.Array, src_mass: jax.Array,
    bands: CellBands, cfg: SimConfig,
) -> jax.Array:
    """The exact P2P near band only (live positions on both sides)."""
    if cfg.use_pallas:
        from nbody_tpu.ops.pallas.forces import near_span_pallas

        return near_span_pallas(
            pos_s, src_pos, src_mass,
            bands.win_first, bands.win_mask, bands.win_cnt, cfg,
        )
    return near_correction_jnp(
        pos_s, src_pos, src_mass, bands.win_first, bands.win_mask, cfg
    )
