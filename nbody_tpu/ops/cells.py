"""Adaptive octree source cells from sorted Morton codes — scan-only.

The production force path groups SOURCE particles into cells of at most
`force_tile` bodies.  Fixed-count Morton runs are cheap but straddle
octree cell boundaries, so their bounding boxes (and those of their
sub-runs) can be as wide as the whole domain — which blows up the
multipole-acceptance near field.  This module instead computes the
adaptive octree CUT: for every particle, the shallowest depth d at which
its Morton cell holds <= B particles.  Cut cells are genuine octree cells,
so their widths shrink with density and their children (depth d+1 cells)
are ~half their size — exactly the property the mid band needs.

Everything is built from cumulative scans over the SORTED code array —
no O(N) gathers (XLA gather costs ~5-10 ns/element on TPU; scans cost
~1 ns/element).  The cut depth comes from TWO sliding-window extrema
over the adjacent-LCP array (see _sliding_cut_depth) — O(N) work
independent of the depth range, which is what makes 21-level codes
affordable.  The reference builds the same structure by atomic insertion
(nbody_v5.cu:98-156); this is the closed-form equivalent.

Codes come in two widths (ops/morton.py):

  * [N]    uint32 — 30-bit v5 codes, 10 levels.  The lattice floor is
           box/1024: once a contracted core (or an expanded bounding
           box) pushes real structure below it, same-cell particles can
           no longer be separated and the near band degenerates to huge
           exact P2P sets (measured: the unbounded near-demand tail).
  * [N, 2] uint32 — (hi, lo) halves of the legacy 63-bit codes,
           21 levels (lattice box/2^21) — the production default; the
           cut follows real structure all the way down.

Cells still denser than B at the maximum depth (heavy clustering below
Morton resolution) are split into B-particle runs — inside one finest
cell, so still spatially tight.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

_I32 = jnp.int32
MAX_DEPTH = 10     # 30-bit codes / 3 bits per level
MAX_DEPTH_63 = 21  # 63-bit codes


class SourceCells(NamedTuple):
    """Adaptive cut cells (padded to a static capacity g_cap).

    `child_*` hold each cell's <= 8 children (depth+1 cells, or B/8 runs
    for cells at max depth) padded to 8 slots; the mid band refines
    failing cells to these children.  `gchild_*` hold each CHILD's <= 8
    children (depth+2 cells, or B/64 runs) — the second refinement level:
    a failing child is refined to its grandchildren (tabC) or, if those
    still fail, to an exact P2P span.
    """

    first: jax.Array        # [Gc] int32 sorted-particle start (0 pad)
    count: jax.Array        # [Gc] int32 particles in cell (0 pad)
    com: jax.Array          # [Gc, 3]
    gmass: jax.Array        # [Gc] G_CONST * mass (0 pad)
    diam: jax.Array         # [Gc] max bbox extent (0 pad)
    lo: jax.Array           # [Gc, 3] bbox lower corner (+inf pad)
    hi: jax.Array           # [Gc, 3] bbox upper corner (-inf pad)
    child_com: jax.Array    # [Gc, 8, 3]
    child_gmass: jax.Array  # [Gc, 8] (0 for empty slots)
    child_diam: jax.Array   # [Gc, 8]
    child_diam_max: jax.Array  # [Gc] max over children
    child_first: jax.Array  # [Gc, 8] int32 sorted-particle start (0 pad)
    child_count: jax.Array  # [Gc, 8] int32 (0 for empty slots)
    gchild_com: jax.Array   # [Gc, 8, 8, 3] grandchild monopoles
    gchild_gmass: jax.Array # [Gc, 8, 8]
    gchild_diam_max: jax.Array  # [Gc, 8] max grandchild width per child
    gchild_complete: jax.Array  # [Gc, 8] bool — ALL of this child's
                            # grandchild segments fit inside the c2 cap.
                            # On cap overflow a child's trailing segments
                            # are dropped (zeroed, never aliased), so its
                            # grandchild monopoles no longer telescope to
                            # the child mass; the classifier must not
                            # refine such a child to grandchildren
                            # (it goes to exact P2P instead)
    skin: jax.Array         # [Gc] max per-particle drift bound in cell
                            # (0 when no drift array was given)
    child_skin: jax.Array   # [Gc, 8] same per child (bounds its
                            # grandchildren too — they are subsets)
    n_cells: jax.Array      # [] int32 actual cell count
    n_child: jax.Array      # [] int32 actual child-segment count
    n_g2: jax.Array         # [] int32 actual grandchild-segment count
    overflow: jax.Array     # [] bool — cut larger than Gc or the child
                            # cap: truncated segments' mass is MISSING
                            # from every band (loud failure).  (The child
                            # cap is structurally unreachable: c_cap =
                            # 8 * g_cap and every cell has <= 8 children.)
    overflow_g2: jax.Array  # [] bool — grandchild segments exceed the c2
                            # cap: GRACEFUL — affected children carry
                            # gchild_complete=False and take the exact
                            # P2P path (a perf effect, never missing
                            # mass)


def _seg_scan_minmax(x: jax.Array, boundary: jax.Array):
    """Segmented running (min, max) of x [N, K], segments start where
    boundary [N] is True; the LAST element of each segment holds the
    segment's min/max."""

    def combine(a, b):
        fa, mna, mxa = a
        fb, mnb, mxb = b
        mn = jnp.where(fb[:, None], mnb, jnp.minimum(mna, mnb))
        mx = jnp.where(fb[:, None], mxb, jnp.maximum(mxa, mxb))
        return fa | fb, mn, mx

    _, mn, mx = lax.associative_scan(combine, (boundary, x, x))
    return mn, mx


def _seg_scan_max(x: jax.Array, boundary: jax.Array) -> jax.Array:
    """Segmented running max of x [N]; the LAST element of each segment
    holds the segment's max."""

    def combine(a, b):
        fa, xa = a
        fb, xb = b
        return fa | fb, jnp.where(fb, xb, jnp.maximum(xa, xb))

    _, mx = lax.associative_scan(combine, (boundary, x))
    return mx


def _cumsum_prefix(x: jax.Array) -> jax.Array:
    """P[k] = sum(x[:k]); length N+1."""
    c = jnp.cumsum(x, axis=0)
    z = jnp.zeros((1,) + x.shape[1:], x.dtype)
    return jnp.concatenate([z, c], axis=0)


def code_bits(codes: jax.Array) -> int:
    """30 for [N] uint32 codes, 63 for [N, 2] (hi, lo) pairs."""
    return 63 if codes.ndim == 2 else 30


def max_depth_of(codes: jax.Array) -> int:
    return MAX_DEPTH_63 if codes.ndim == 2 else MAX_DEPTH


def lcp_between(a: jax.Array, b: jax.Array) -> jax.Array:
    """Length of the shared leading-bit prefix of two code arrays (same
    representation as the sorted codes: [K] uint32 or [K, 2] pairs).
    Counted from the top code bit (bit 29 of 30 / bit 62 of 63), so a
    shared prefix >= 3d means "same depth-d octree cell"."""
    if a.ndim == 2:
        xh = a[:, 0] ^ b[:, 0]
        xl = a[:, 1] ^ b[:, 1]
        # hi carries code bits 32..62 in its low 31 bits (top bit 0), so
        # the leading mismatch at u32 bit k means clz-1 shared code bits
        lcp_hi = lax.clz(xh).astype(_I32) - 1
        lcp_lo = 31 + jnp.where(xl == 0, 32, lax.clz(xl).astype(_I32))
        return jnp.where(xh != 0, lcp_hi, jnp.where(xl != 0, lcp_lo, 63))
    x = a ^ b
    return jnp.where(x == 0, 30, lax.clz(x).astype(_I32) - 2)


def adjacent_lcp(codes_sorted: jax.Array) -> jax.Array:
    """Per-particle LCP with the LEFT sorted neighbor; element 0 gets
    the full code width (no left neighbor — callers force a boundary
    there explicitly)."""
    prev = jnp.concatenate([codes_sorted[:1], codes_sorted[:-1]], axis=0)
    return lcp_between(codes_sorted, prev)


def _block_cummin(x: jax.Array, w: int, reverse: bool) -> jax.Array:
    return lax.cummin(x.reshape(-1, w), axis=1, reverse=reverse).reshape(-1)


def _block_cummax(x: jax.Array, w: int, reverse: bool) -> jax.Array:
    return lax.cummax(x.reshape(-1, w), axis=1, reverse=reverse).reshape(-1)


def _sliding_cut_depth(lcp: jax.Array, b: int, max_depth: int,
                       x_off=None, n_total: int | None = None) -> jax.Array:
    """UNCLAMPED cut depth per particle from the adjacent-LCP array.

    cnt_d(i) > b  <=>  some window of b+1 consecutive sorted particles
    containing i lies in one depth-d cell  <=>  3d <= L(i), where
        L(i) = max_{s in [i-b, i]} min(lcp[s+1 .. s+b])
    (window [s, s+b] of particles shares a cell iff every adjacent pair
    inside shares it).  cut(i) = floor(L(i)/3) + 1 — the shallowest depth
    whose cell holds <= b.  Both sliding extrema use the two-pass block
    decomposition (prefix + suffix scan at block width = window width):
    O(N) work independent of max_depth, replacing the old [N, D]
    per-depth boundary matrix.  floor(L/3)+1 is cell-consistent even
    though L itself varies by +-2 within a cell (the predicate family
    {cnt_d > b} it encodes is shared by all members of a cell).

    WINDOWED use (build_source_cells_window): when `lcp` covers a window
    of a larger array, pass `x_off` (the global index of window element
    0, traced ok) and `n_total` so W positions whose global window
    [x, x+b) leaves [1, n_total - b + 1) are invalidated (-1) exactly as
    the global computation's out-of-range padding does — otherwise
    edge-pad rows fabricate deeper cuts at the array ends.
    """
    n = lcp.shape[0]
    if n <= b:
        return jnp.zeros((n,), _I32)
    big = jnp.int32(64)
    # W(x) = min lcp[x .. x+b-1], valid for x in [1, n-b].  All the
    # shifted reads below are STATIC SLICES (x is an affine range), never
    # index-array gathers — an iota gather costs ~9 ns/element on TPU
    # (measured: the gather form made this function ~3x slower).
    padw = (-n) % b if b > 1 else 0
    lp = jnp.concatenate([lcp, jnp.full((padw,), big, _I32)]) if padw else lcp
    pre = _block_cummin(lp, b, False)
    suf = _block_cummin(lp, b, True)
    w_min = jnp.minimum(suf[1:n - b + 1], pre[b:n])      # [n-b], W(x+1)
    if n_total is not None:
        xg = jnp.arange(1, n - b + 1, dtype=_I32) + jnp.asarray(x_off, _I32)
        w_min = jnp.where((xg >= 1) & (xg <= n_total - b), w_min, -1)
    # M[s] = W(s+1) for s in [0, n-1-b]; L(i) = max over the width-(b+1)
    # window Mp[i .. i+b] where Mp[j] = M[j-b], out-of-range s -> -1
    wv = b + 1
    mp = jnp.concatenate([
        jnp.full((b,), -1, _I32), w_min,
        jnp.full((b + (-(n + b)) % wv,), -1, _I32),
    ])
    pre_m = _block_cummax(mp, wv, False)
    suf_m = _block_cummax(mp, wv, True)
    l_val = jnp.maximum(suf_m[:n], pre_m[b:n + b])
    return jnp.where(l_val < 0, 0, l_val // 3 + 1)


def _compact_bits(v: jax.Array) -> jax.Array:
    """Inverse of morton.expand_bits: extract every 3rd bit — 11 output
    bits (the 63-bit decode reads 11 dilated bits per word; verified
    exhaustively as the inverse for 11-bit inputs)."""
    v = v & jnp.uint32(0x49249249)
    v = (v | (v >> 2)) & jnp.uint32(0xC30C30C3)
    v = (v | (v >> 4)) & jnp.uint32(0x0F00F00F)
    v = (v | (v >> 8)) & jnp.uint32(0xFF0000FF)
    v = (v | (v >> 16)) & jnp.uint32(0x7FF)
    return v


def cell_corner(code: jax.Array, depth: jax.Array, lo: jax.Array, size: jax.Array):
    """Lower corner of the depth-d Morton cell containing `code` (world
    coordinates), vectorized over cells; accepts both code widths ([K]
    uint32 30-bit or [K, 2] (hi, lo) 63-bit).  Only O(G) work — no
    per-particle decode."""
    if code.ndim == 2:
        return _cell_corner63(code[:, 0], code[:, 1], depth, lo, size)
    shift = 3 * (MAX_DEPTH - jnp.minimum(depth, MAX_DEPTH))
    cid = (code >> shift) << shift  # zero the sub-cell bits
    x = _compact_bits(cid >> 2).astype(jnp.float32)
    y = _compact_bits(cid >> 1).astype(jnp.float32)
    z = _compact_bits(cid).astype(jnp.float32)
    lattice = size / 1024.0
    return lo[None, :] + jnp.stack([x, y, z], axis=1) * lattice


def _cell_corner63(hi: jax.Array, lo32: jax.Array, depth: jax.Array,
                   lo: jax.Array, size: jax.Array):
    """63-bit corner decode: zero the sub-cell bits of the (hi, lo) pair,
    then de-interleave each axis from the two words.  Axis a's bits sit
    at code positions 3i+a (X at a=2, morton.encode63 layout): the lo
    word holds i <= 9/10 at word positions 3i+a, the hi word the rest at
    positions (3i+a-32) — each word extracts with the standard every-3rd
    compaction after an axis-specific shift."""
    shift = 3 * (MAX_DEPTH_63 - jnp.minimum(depth, MAX_DEPTH_63))  # 0..63
    sh_hi = jnp.clip(shift - 32, 0, 31).astype(jnp.uint32)
    hi_m = (hi >> sh_hi) << sh_hi
    sh_lo = jnp.clip(shift, 0, 31).astype(jnp.uint32)
    lo_m = jnp.where(shift >= 32, jnp.uint32(0), (lo32 >> sh_lo) << sh_lo)

    def axis(off_lo_shift, hi_shift, hi_out_shift):
        low = _compact_bits(lo_m >> off_lo_shift)
        high = _compact_bits(hi_m >> hi_shift)
        return (low | (high << hi_out_shift)).astype(jnp.float32)

    x = axis(2, 0, 10)   # X: lo bits {2,5,..,29} -> i 0..9; hi {0,3,..,30} -> i 10..20
    y = axis(1, 2, 11)   # Y: lo {1,4,..,31} -> i 0..10; hi {2,5,..,29} -> i 11..20
    z = axis(0, 1, 11)   # Z: lo {0,3,..,30} -> i 0..10; hi {1,4,..,31} -> i 11..20
    lattice = size / jnp.float32(1 << MAX_DEPTH_63)
    return lo[None, :] + jnp.stack([x, y, z], axis=1) * lattice


def last_bmax_boundary(codes_own: jax.Array, left_code: jax.Array,
                       idx0) -> jax.Array:
    """Global index of the LAST max-depth run boundary within the owned
    rows [idx0, idx0 + len(codes_own)), or -1 if none.  `left_code` is
    the global left neighbor of row idx0 (row idx0 - 1; pass codes_own's
    own first row when idx0 == 0 — the first_b rule marks it anyway).
    This is the one cut carry with unbounded reach (a single finest-cell
    run can span shards); see build_source_cells_window."""
    prev = jnp.concatenate([left_code[None], codes_own[:-1]], axis=0)
    lcp = lcp_between(codes_own, prev)
    m = codes_own.shape[0]
    idx = jnp.arange(m, dtype=_I32) + idx0
    max_d = max_depth_of(codes_own)
    bmax = (idx == 0) | (lcp < 3 * max_d)
    return jnp.max(jnp.where(bmax, idx, -1))


def build_source_cells_window(
    codes_sorted: jax.Array,
    pos_sorted: jax.Array,
    mass_sorted: jax.Array,
    b: int,
    g_const: float,
    g_cap_shard: int,
    start,
    own: int,
    n_total: int,
    bmax_carry,
    box_lo: jax.Array,
    box_size: jax.Array,
    drift_sorted: jax.Array | None = None,
    g2_factor: int = 8,
) -> SourceCells:
    """OWNER-COMPUTES shard of the adaptive cut: the cells whose FIRST
    particle lies in the owned range [start, start + own), built from a
    fixed window of the (replicated or halo-exchanged) sorted arrays —
    O(own) work per shard instead of the O(N) replicated build
    (SURVEY.md §2.3 SP/CP, §7 step 8: per-shard top-tree summaries).

    Exactness: the cut depth at row i depends only on the adjacent-LCP
    array within i +- (b+1) rows (_sliding_cut_depth), so a 4b halo on
    each side reproduces the global flags for every owned row; the ONE
    carry with unbounded reach is the last max-depth run boundary
    (`bmax_carry` from last_bmax_boundary, exchanged across shards —
    inside a single finest-cell run the b-run splits are phase-locked to
    that boundary).  Cell/child/grandchild SEGMENTS of owned cells end
    at most b rows past the owned range, inside the right halo.  Moments
    use window-local compensating prefix sums, so they can differ from
    the global build's in final ulps (integer fields are exact) —
    tests/test_cells.py pins the stitched equivalence.

    Returns a SourceCells whose arrays are PER-SHARD (capacity
    g_cap_shard; owned cells packed to a live prefix; n_cells = owned
    count).  `first`/`child_first` are GLOBAL particle indices.  Shards
    concatenated in order ARE the global cell list (cells are disjoint
    runs ordered by first particle); parallel/shard.py gathers and
    compacts them.
    """
    n_win = codes_sorted.shape[0]
    lead = (n_win - own) // 2
    idx = jnp.arange(n_win, dtype=_I32) + (start - lead)   # GLOBAL rows
    c_cap = 8 * g_cap_shard
    max_d = max_depth_of(codes_sorted)

    lcp = adjacent_lcp(codes_sorted)
    cut_depth = _sliding_cut_depth(lcp, b, max_d,
                                   x_off=start - lead, n_total=n_total)
    at_max = cut_depth >= max_d

    first_b = idx == 0
    grp_b = first_b | (lcp < 3 * jnp.minimum(cut_depth, max_d))
    bmax = first_b | (lcp < 3 * max_d)
    st_max = jnp.maximum(lax.cummax(jnp.where(bmax, idx, -1)),
                         jnp.asarray(bmax_carry, _I32))
    grp_b = grp_b | (at_max & ((idx - st_max) % b == 0))

    chd_b = grp_b | (lcp < 3 * jnp.minimum(cut_depth + 1, max_d))
    sub = max(b // 8, 1)
    grp_start = lax.cummax(jnp.where(grp_b, idx, -1))
    chd_b = chd_b | (at_max & ((idx - grp_start) % sub == 0))

    g2_b = chd_b | (lcp < 3 * jnp.minimum(cut_depth + 2, max_d))
    sub2 = max(b // 64, 1)
    chd_start = lax.cummax(jnp.where(chd_b, idx, -1))
    g2_b = g2_b | (at_max & ((idx - chd_start) % sub2 == 0))

    # ownership: a segment belongs to this shard iff its CELL starts in
    # the owned range (children/grandchildren follow their cell, so the
    # last owned cell's segments — which may START in the right halo —
    # stay with it)
    owner = (grp_start >= start) & (grp_start < start + own)
    own_grp = grp_b & owner
    own_chd = chd_b & owner
    own_g2 = g2_b & owner

    n_cells = jnp.sum(own_grp.astype(_I32))
    n_child = jnp.sum(own_chd.astype(_I32))
    n_g2 = jnp.sum(own_g2.astype(_I32))
    c2_cap = min(g2_factor, 8) * c_cap
    overflow = (n_cells > g_cap_shard) | (n_child > c_cap)
    overflow_g2 = n_g2 > c2_cap

    big = jnp.iinfo(jnp.int32).max

    # next same-level boundary AFTER each row (global index; reverse
    # exclusive min) — segment counts never reference the (unowned) next
    # shard's compacted lists
    def next_boundary(flags):
        nxt = lax.cummin(jnp.where(flags, idx, big), reverse=True)
        return jnp.concatenate([nxt[1:], jnp.full((1,), big, _I32)])

    nxt_grp = next_boundary(grp_b)
    nxt_chd = next_boundary(chd_b)
    nxt_g2 = next_boundary(g2_b)
    # the last owned cell may END past the window's right edge only if a
    # boundary is missing inside the halo — impossible for halo >= b
    # (cells hold <= b particles); clamp to the window end AND to the
    # true global row count (right-edge pads are edge-replicated codes
    # with no boundary, so the LAST shard's final cell would otherwise
    # swallow them)
    end_win = jnp.minimum(start - lead + n_win, n_total)

    def compact(flags, nxt, cap):
        key = jnp.where(flags, idx, big)
        skey = lax.sort(key)
        if cap <= n_win:
            firsts = skey[:cap]
        else:
            firsts = jnp.concatenate(
                [skey, jnp.full((cap - n_win,), big, _I32)]
            )
        live = firsts < big
        rel = jnp.clip(firsts - (start - lead), 0, n_win - 1)
        ends = jnp.minimum(nxt[rel], end_win)
        count = jnp.where(live, ends - firsts, 0)
        return jnp.where(live, firsts, 0), count, rel

    g_first, g_count, g_rel = compact(own_grp, nxt_grp, g_cap_shard)
    c_first, c_count, c_rel = compact(own_chd, nxt_chd, c_cap)
    c2_first, c2_count, c2_rel = compact(own_g2, nxt_g2, c2_cap)

    # --- per-segment reductions over the WINDOW (prefix differences) ---
    pmw = _cumsum_prefix(
        jnp.concatenate(
            [mass_sorted[:, None], pos_sorted * mass_sorted[:, None]],
            axis=1,
        )
    )

    big_f = jnp.float32(3.0e38)

    def seg_moments(rel, count):
        valid = count > 0
        d = pmw[jnp.clip(rel + count, 0, n_win)] - pmw[rel]
        m = d[:, 0]
        com = jnp.where(
            valid[:, None], d[:, 1:4] / jnp.maximum(m, 1e-20)[:, None], 0.0
        )
        return com, g_const * m * valid, valid

    def analytic_stats(rel, count, depth):
        valid = count > 0
        width = jnp.where(
            valid,
            box_size * jnp.exp2(-jnp.minimum(depth, max_d).astype(jnp.float32)),
            0.0,
        )
        corner = cell_corner(codes_sorted[rel], depth, box_lo, box_size)
        lo = jnp.where(valid[:, None], corner, big_f)
        hi = jnp.where(valid[:, None], corner + width[:, None], -big_f)
        return width, lo, hi

    g_com, g_gm, _ = seg_moments(g_rel, g_count)
    c_com, c_gm, _ = seg_moments(c_rel, c_count)
    c2_com, c2_gm, _ = seg_moments(c2_rel, c2_count)

    if drift_sorted is not None:
        mxd_g = _seg_scan_max(drift_sorted, grp_b)
        mxd_c = _seg_scan_max(drift_sorted, chd_b)

        def seg_skin(rel, count, mx):
            valid = count > 0
            lastp = jnp.clip(rel + count - 1, 0, n_win - 1)
            return jnp.where(valid, mx[lastp], 0.0)

        g_skin = seg_skin(g_rel, g_count, mxd_g)
        c_skin = seg_skin(c_rel, c_count, mxd_c)
    else:
        g_skin = jnp.zeros((g_cap_shard,), jnp.float32)
        c_skin = jnp.zeros((c_cap,), jnp.float32)

    g_depth = cut_depth[g_rel]
    g_diam, g_lo, g_hi = analytic_stats(g_rel, g_count, g_depth)
    c_depth = jnp.minimum(cut_depth[c_rel] + 1, max_d)
    c_diam, _, _ = analytic_stats(c_rel, c_count, c_depth)
    c2_depth = jnp.minimum(cut_depth[c2_rel] + 2, max_d)
    c2_diam, _, _ = analytic_stats(c2_rel, c2_count, c2_depth)

    # --- regroup kids under parents (same construction as the global
    # build, over the PER-SHARD compacted ids: owned kids are exactly the
    # owned parents' kids, contiguous in the same order) ---
    chd_id = jnp.cumsum(own_chd.astype(_I32)) - 1   # per-shard kid ids
    g2_id = jnp.cumsum(own_g2.astype(_I32)) - 1

    def regroup(parent_count, parent_rel, kid_id, kid_cap, n_kid_total):
        valid = parent_count > 0
        base = jnp.where(valid, kid_id[parent_rel], n_kid_total)
        nxt = jnp.concatenate([base[1:], jnp.full((1,), 0, _I32)])
        nxt = jnp.where(
            jnp.concatenate([valid[1:], jnp.zeros((1,), bool)]),
            nxt, n_kid_total,
        )
        n_kids = jnp.clip(jnp.where(valid, nxt - base, 0), 0, 8)
        raw = base[:, None] + jnp.arange(8, dtype=_I32)[None, :]
        ok = (jnp.arange(8, dtype=_I32)[None, :] < n_kids[:, None]) & (
            raw < kid_cap
        )
        slot = jnp.clip(raw, 0, kid_cap - 1)
        complete = valid & (base + n_kids <= kid_cap)
        return slot, ok, complete

    valid_g = g_count > 0
    slot_c, kid_ok, _ = regroup(g_count, g_rel, chd_id, c_cap, n_child)
    childf = jnp.concatenate(
        [c_com, c_gm[:, None], c_diam[:, None], c_skin[:, None],
         lax.bitcast_convert_type(c_first, jnp.float32)[:, None],
         lax.bitcast_convert_type(c_count, jnp.float32)[:, None]], axis=1,
    )
    cg = jnp.where(kid_ok[..., None], childf[slot_c], 0.0)
    child_com = cg[..., 0:3]
    child_gm = cg[..., 3]
    child_diam = cg[..., 4]
    child_skin = cg[..., 5]
    child_first = lax.bitcast_convert_type(cg[..., 6], _I32)
    child_count = lax.bitcast_convert_type(cg[..., 7], _I32)

    slot_2, ok_2, complete_2 = regroup(c_count, c_rel, g2_id, c2_cap, n_g2)
    g2f = jnp.concatenate(
        [c2_com, c2_gm[:, None], c2_diam[:, None]], axis=1
    )
    g2g = jnp.where(ok_2[..., None], g2f[slot_2], 0.0)
    gc_com_f = g2g[..., 0:3]
    gc_gm_f = g2g[..., 3]
    gdm_f = jnp.max(g2g[..., 4], axis=1)
    gchild_com = jnp.where(kid_ok[..., None, None], gc_com_f[slot_c], 0.0)
    gchild_gm = jnp.where(kid_ok[..., None], gc_gm_f[slot_c], 0.0)
    gchild_dm = jnp.where(kid_ok, gdm_f[slot_c], 0.0)
    gchild_complete = kid_ok & complete_2[slot_c]

    return SourceCells(
        first=jnp.where(valid_g, g_first, 0),
        count=g_count,
        com=g_com,
        gmass=g_gm,
        diam=g_diam,
        lo=g_lo,
        hi=g_hi,
        child_com=child_com,
        child_gmass=child_gm,
        child_diam=child_diam,
        child_diam_max=jnp.max(child_diam, axis=1),
        child_first=child_first,
        child_count=child_count,
        gchild_com=gchild_com,
        gchild_gmass=gchild_gm,
        gchild_diam_max=gchild_dm,
        gchild_complete=gchild_complete,
        skin=jnp.where(valid_g, g_skin, 0.0),
        child_skin=child_skin,
        n_cells=n_cells,
        n_child=n_child,
        n_g2=n_g2,
        overflow=overflow,
        overflow_g2=overflow_g2,
    )


def build_source_cells(
    codes_sorted: jax.Array,
    pos_sorted: jax.Array,
    mass_sorted: jax.Array,
    b: int,
    g_const: float,
    g_cap: int,
    box_lo: jax.Array | None = None,
    box_size: jax.Array | None = None,
    drift_sorted: jax.Array | None = None,
    g2_factor: int = 8,
) -> SourceCells:
    """Compute the adaptive cut and per-cell + per-child monopoles.

    `drift_sorted` [N] (optional): per-particle drift bound over a band-
    reuse cycle; cells/children carry the segment max as `skin` /
    `child_skin` so the MAC can be inflated per SOURCE instead of by a
    global worst case (one extreme particle would otherwise widen every
    band).

    When (box_lo, box_size) — the cubified AABB the codes were quantized
    against — are given, cell geometry (corner, width) is ANALYTIC from
    the Morton lattice: width = size / 2^depth, exactly the reference's
    cell-width MAC size (node.maxX - node.minX, nbody_v5.cu:232), and the
    two heavy segmented min/max scans are skipped.  Without them, widths
    fall back to per-cell particle bounding boxes (tighter but ~2x the
    build cost)."""
    n = codes_sorted.shape[0]
    idx = jnp.arange(n, dtype=_I32)
    c_cap = 8 * g_cap
    max_d = max_depth_of(codes_sorted)

    # --- cut depth from two sliding-window extrema over the LCP array ---
    lcp = adjacent_lcp(codes_sorted)                          # [N]
    cut_depth = _sliding_cut_depth(lcp, b, max_d)             # unclamped
    at_max = cut_depth >= max_d

    # a particle starts its cell iff the left-neighbor LCP drops below
    # its cell's prefix length (cut_depth is cell-consistent, see
    # _sliding_cut_depth); element 0 is always a boundary
    first_b = idx == 0
    grp_b = first_b | (lcp < 3 * jnp.minimum(cut_depth, max_d))
    # cells denser than b at max depth split into b-runs
    bmax = first_b | (lcp < 3 * max_d)
    st_max = lax.cummax(jnp.where(bmax, idx, -1))
    grp_b = grp_b | (at_max & ((idx - st_max) % b == 0))

    # children: depth+1 cells; for max-depth cells, b/8-runs
    chd_b = grp_b | (lcp < 3 * jnp.minimum(cut_depth + 1, max_d))
    sub = max(b // 8, 1)
    grp_start = lax.cummax(jnp.where(grp_b, idx, -1))
    chd_b = chd_b | (at_max & ((idx - grp_start) % sub == 0))

    # grandchildren: depth+2 cells; for max-depth cells, b/64-runs within
    # each child run (still spatially tight: inside one finest cell)
    g2_b = chd_b | (lcp < 3 * jnp.minimum(cut_depth + 2, max_d))
    sub2 = max(b // 64, 1)
    chd_start = lax.cummax(jnp.where(chd_b, idx, -1))
    g2_b = g2_b | (at_max & ((idx - chd_start) % sub2 == 0))

    grp_id = jnp.cumsum(grp_b.astype(_I32)) - 1
    chd_id = jnp.cumsum(chd_b.astype(_I32)) - 1
    g2_id = jnp.cumsum(g2_b.astype(_I32)) - 1
    n_cells = grp_id[-1] + 1
    n_child = chd_id[-1] + 1
    n_g2 = g2_id[-1] + 1
    # grandchild segment capacity: structurally up to 8*c_cap, but cells
    # average ~2-4 live grandchildren per child, and every array below
    # this cap costs gather traffic per rebuild — overflow is flagged
    c2_cap = min(g2_factor, 8) * c_cap
    overflow = (n_cells > g_cap) | (n_child > c_cap)
    overflow_g2 = n_g2 > c2_cap

    # --- compact segment starts (sort beats scatter ~6x on TPU) ---
    big = jnp.iinfo(jnp.int32).max

    def compact_starts(flags, cap):
        key = jnp.where(flags, idx, big)
        skey = lax.sort(key)
        if cap + 1 <= n:
            out = skey[: cap + 1]
        else:
            out = jnp.concatenate(
                [skey, jnp.full((cap + 1 - n,), big, _I32)]
            )
        return jnp.minimum(out, n)  # padding -> n

    g_edges = compact_starts(grp_b, g_cap)   # [g_cap+1]
    c_edges = compact_starts(chd_b, c_cap)   # [c_cap+1]
    g2_edges = compact_starts(g2_b, c2_cap)  # [c2_cap+1]
    g_first = g_edges[:g_cap]
    g_count = jnp.clip(g_edges[1:] - g_first, 0, n)
    c_first = c_edges[:c_cap]
    c_count = jnp.clip(c_edges[1:] - c_first, 0, n)
    c2_first = g2_edges[:c2_cap]
    c2_count = jnp.clip(g2_edges[1:] - c2_first, 0, n)

    # --- per-segment reductions ---
    # packed prefix [mass, m*x, m*y, m*z] so each segment needs two
    # 4-wide ROW gathers (~0.55 ns/elem) instead of four 1D gathers
    pmw = _cumsum_prefix(
        jnp.concatenate(
            [mass_sorted[:, None], pos_sorted * mass_sorted[:, None]], axis=1
        )
    )                                                        # [N+1, 4]
    analytic = box_lo is not None and box_size is not None
    if not analytic:
        mn_g, mx_g = _seg_scan_minmax(pos_sorted, grp_b)
        mn_c, mx_c = _seg_scan_minmax(pos_sorted, chd_b)
        mn_g2, mx_g2 = _seg_scan_minmax(pos_sorted, g2_b)

    big_f = jnp.float32(3.0e38)

    def seg_moments(first, count):
        valid = count > 0
        fc = jnp.clip(first, 0, n - 1)
        d = pmw[jnp.clip(first + count, 0, n)] - pmw[fc]     # [K, 4]
        m = d[:, 0]
        com = jnp.where(valid[:, None], d[:, 1:4] / jnp.maximum(m, 1e-20)[:, None], 0.0)
        return com, g_const * m * valid, valid

    def bbox_stats(first, count, mn, mx):
        valid = count > 0
        lastp = jnp.clip(first + count - 1, 0, n - 1)
        lo = jnp.where(valid[:, None], mn[lastp], big_f)
        hi = jnp.where(valid[:, None], mx[lastp], -big_f)
        diam = jnp.where(valid, jnp.max(mx[lastp] - mn[lastp], axis=1), 0.0)
        return diam, lo, hi

    def analytic_stats(first, count, depth):
        valid = count > 0
        fc = jnp.clip(first, 0, n - 1)
        width = jnp.where(
            valid,
            box_size * jnp.exp2(-jnp.minimum(depth, max_d).astype(jnp.float32)),
            0.0,
        )
        corner = cell_corner(codes_sorted[fc], depth, box_lo, box_size)
        lo = jnp.where(valid[:, None], corner, big_f)
        hi = jnp.where(valid[:, None], corner + width[:, None], -big_f)
        return width, lo, hi

    g_com, g_gm, _ = seg_moments(g_first, g_count)
    c_com, c_gm, _ = seg_moments(c_first, c_count)
    c2_com, c2_gm, _ = seg_moments(c2_first, c2_count)

    # per-segment drift-bound maxima (source-local MAC skins)
    if drift_sorted is not None:
        mxd_g = _seg_scan_max(drift_sorted, grp_b)
        mxd_c = _seg_scan_max(drift_sorted, chd_b)

        def seg_skin(first, count, mx):
            valid = count > 0
            lastp = jnp.clip(first + count - 1, 0, n - 1)
            return jnp.where(valid, mx[lastp], 0.0)

        g_skin = seg_skin(g_first, g_count, mxd_g)
        c_skin = seg_skin(c_first, c_count, mxd_c)
    else:
        g_skin = jnp.zeros((g_cap,), jnp.float32)
        c_skin = jnp.zeros((c_cap,), jnp.float32)
    if analytic:
        gf_safe0 = jnp.clip(g_first, 0, n - 1)
        g_depth = cut_depth[gf_safe0]
        g_diam, g_lo, g_hi = analytic_stats(g_first, g_count, g_depth)
        cf_safe0 = jnp.clip(c_first, 0, n - 1)
        c_depth = jnp.minimum(cut_depth[cf_safe0] + 1, max_d)
        c_diam, _, _ = analytic_stats(c_first, c_count, c_depth)
        c2f_safe0 = jnp.clip(c2_first, 0, n - 1)
        c2_depth = jnp.minimum(cut_depth[c2f_safe0] + 2, max_d)
        c2_diam, _, _ = analytic_stats(c2_first, c2_count, c2_depth)
    else:
        g_diam, g_lo, g_hi = bbox_stats(g_first, g_count, mn_g, mx_g)
        c_diam, _, _ = bbox_stats(c_first, c_count, mn_c, mx_c)
        c2_diam, _, _ = bbox_stats(c2_first, c2_count, mn_g2, mx_g2)

    # --- regroup kids to <=8 parent slots: parent i's kids are the
    # contiguous kid ids [kid_id[first[i]], kid_id[first[i+1]]) ---
    def regroup(parent_first, parent_count, kid_id, kid_cap, n_kid_total):
        valid = parent_count > 0
        pf = jnp.clip(parent_first, 0, n - 1)
        base = jnp.where(valid, kid_id[pf], n_kid_total)
        nxt = jnp.concatenate([base[1:], jnp.full((1,), 0, _I32)])
        nxt = jnp.where(
            jnp.concatenate([valid[1:], jnp.zeros((1,), bool)]),
            nxt, n_kid_total,
        )
        n_kids = jnp.clip(jnp.where(valid, nxt - base, 0), 0, 8)
        raw = base[:, None] + jnp.arange(8, dtype=_I32)[None, :]
        # a kid slot past the kid cap must be DROPPED (zeroed by ok), not
        # clipped onto the last stored segment — clipping would alias an
        # unrelated segment's moments into this parent
        ok = (jnp.arange(8, dtype=_I32)[None, :] < n_kids[:, None]) & (
            raw < kid_cap
        )
        slot = jnp.clip(raw, 0, kid_cap - 1)
        # parents whose kid range fits entirely inside the cap: only these
        # telescope exactly (sum of kid moments == parent moment)
        complete = valid & (base + n_kids <= kid_cap)
        return slot, ok, complete

    valid_g = g_count > 0
    slot_c, kid_ok, _ = regroup(g_first, g_count, chd_id, c_cap, n_child)
    # ONE packed row-gather per regroup level: separate 1D gathers cost
    # ~9.3 ns/element on TPU vs ~4.4 ns/ROW for packed rows (PERF.md) —
    # measured ~23 ms of the 1M cell build before packing.  int32 fields
    # ride along bitcast to f32 (gathers move bits, never arithmetic).
    childf = jnp.concatenate(
        [c_com, c_gm[:, None], c_diam[:, None], c_skin[:, None],
         lax.bitcast_convert_type(c_first, jnp.float32)[:, None],
         lax.bitcast_convert_type(c_count, jnp.float32)[:, None]], axis=1,
    )                                                            # [Cc, 8]
    cg = jnp.where(kid_ok[..., None], childf[slot_c], 0.0)       # [Gc, 8, 8]
    child_com = cg[..., 0:3]
    child_gm = cg[..., 3]
    child_diam = cg[..., 4]
    child_skin = cg[..., 5]
    child_first = lax.bitcast_convert_type(cg[..., 6], _I32)
    child_count = lax.bitcast_convert_type(cg[..., 7], _I32)

    # grandchildren: regroup c2 segments under each FLAT child, then lift
    # to [Gc, 8, 8] through the cell->child slots.  (The child level is
    # structurally safe from cap overflow — c_cap = 8*g_cap and every cell
    # has <= 8 children — but c2_cap = g2_factor*c_cap with g2_factor < 8
    # is reachable; `complete` marks the children whose grandchildren all
    # fit, the only ones the classifier may refine to grandchildren.)
    slot_2, ok_2, complete_2 = regroup(c_first, c_count, g2_id, c2_cap, n_g2)
    g2f = jnp.concatenate(
        [c2_com, c2_gm[:, None], c2_diam[:, None]], axis=1
    )                                                            # [C2, 5]
    g2g = jnp.where(ok_2[..., None], g2f[slot_2], 0.0)           # [Cc, 8, 5]
    gc_com_f = g2g[..., 0:3]
    gc_gm_f = g2g[..., 3]
    gdm_f = jnp.max(g2g[..., 4], axis=1)                         # [Cc]
    gchild_com = jnp.where(kid_ok[..., None, None], gc_com_f[slot_c], 0.0)
    gchild_gm = jnp.where(kid_ok[..., None], gc_gm_f[slot_c], 0.0)
    gchild_dm = jnp.where(kid_ok, gdm_f[slot_c], 0.0)
    gchild_complete = kid_ok & complete_2[slot_c]

    return SourceCells(
        first=jnp.where(valid_g, g_first, 0),
        count=g_count,
        com=g_com,
        gmass=g_gm,
        diam=g_diam,
        lo=g_lo,
        hi=g_hi,
        child_com=child_com,
        child_gmass=child_gm,
        child_diam=child_diam,
        child_diam_max=jnp.max(child_diam, axis=1),
        child_first=child_first,
        child_count=child_count,
        gchild_com=gchild_com,
        gchild_gmass=gchild_gm,
        gchild_diam_max=gchild_dm,
        gchild_complete=gchild_complete,
        skin=jnp.where(valid_g, g_skin, 0.0),
        child_skin=child_skin,
        n_cells=n_cells,
        n_child=n_child,
        n_g2=n_g2,
        overflow=overflow,
        overflow_g2=overflow_g2,
    )
