"""Pallas TPU kernels for the hierarchical dense Barnes-Hut force path.

Replaces the CUDA computeForceKernel's gather-heavy per-thread tree walk
(nbody_v5.cu:215-249) with three dense kernels (see ops/forces.py for the
band decomposition and why: XLA gather costs ~5-10 ns/element on TPU, so
the TPU-native design never gathers on the hot path):

  * `far_sweep_pallas`       — every particle block (B x 3) against every
    SUPER monopole, streamed as flat planar chunks.  Pure dense VPU
    panels.
  * `table_sweep_pallas`     — the same panel math over PER-TARGET band
    tables (cell/child monopoles + anti-rows) gathered by the band
    classifier.
  * `near_span_pallas`       — exact P2P against DEDUPLICATED masked
    near windows.  A near child's particles are CONTIGUOUS in the
    Morton-sorted arrays; the classifier converts child runs into
    distinct 128-aligned windows with 128-bit lane masks (all runs in a
    window OR-merged), so they arrive as 128-aligned block DMAs (KSEG
    windows per wait round, double buffered); per-target window rows +
    masks are DMA'd into SMEM for scalar indexing.

Layout notes (fp32 tiles are (8,128), lanes last — see the Pallas guide):
panels are (B, LC) with sources on lanes; no transposes anywhere; the
distance panel uses explicit coordinate differences, not the
|p-q|^2 = p^2+q^2-2pq identity (fp32 cancellation at galaxy coordinate
scales, and a K=3 MXU contraction would waste 125/128 of the array).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nbody_tpu.config import SimConfig

# Group-monopole chunk per far/mid-sweep grid step: LC logical rows,
# loaded as a (SUBQ, SB) block whose SUBLANE rows are SB-wide quarter-
# slices (quarterize()).  Compute is gated per quarter on the live row
# count, so executed lanes = ceil(live/SB)*SB — 4x finer than the old
# flat-T(1024) chunk rounding.  (Lane-offset slices of a (LC,) vector
# cannot be broadcast on Mosaic — "Invalid input layout" — and 2D
# (chunks, LC) arrays reject sublane-1 blocks, hence the sublane-stacked
# layout; verified to compile and run on v5e.)
LC = 1024
SUBQ = 4
SB = LC // SUBQ


def quarterize(flat: jax.Array) -> jax.Array:
    """(n_chunks*LC,) plane -> (SUBQ, n_chunks*SB): logical rows
    [c*LC + q*SB, c*LC + (q+1)*SB) land at [q, c*SB:(c+1)*SB]."""
    return (
        flat.reshape(-1, SUBQ, SB).transpose(1, 0, 2).reshape(SUBQ, -1)
    )

# Near-kernel segment width: source windows fetched/evaluated per loop
# iteration (KSEG DMAs in flight per buffer, double-buffered).  Panels are
# evaluated in KSPLIT sub-panels to bound VMEM temporaries.  Spans are
# pre-split by the classifier so each lies in ONE aligned WSPAN-wide
# window (forces.SPAN_ALIGN) — the DMA fetches exactly that window.
KSEG = 8
KSPLIT = 2
WSPAN = 128


def _interpret() -> bool:
    return jax.default_backend() not in ("tpu", "axon")


# ---------------------------------------------------------------------------
# far sweep
# ---------------------------------------------------------------------------


def _panel_part(p, qx, qy, qz, qm, soft):
    """(B, S) monopole panel: acceleration of targets p against one
    (1, S) planar source slice."""
    dx = qx - p[:, 0:1]                 # (B, S)
    dy = qy - p[:, 1:2]
    dz = qz - p[:, 2:3]
    d2 = dx * dx + dy * dy + dz * dz
    inv = lax.rsqrt(d2 + soft)
    w = qm * (inv * inv * inv)
    ax = jnp.sum(w * dx, axis=1, keepdims=True)
    ay = jnp.sum(w * dy, axis=1, keepdims=True)
    az = jnp.sum(w * dz, axis=1, keepdims=True)
    return jnp.concatenate([ax, ay, az], axis=1)


def _gated_accum(acc_ref, p, x_ref, y_ref, z_ref, gm_ref, base, rows, soft):
    """Accumulate the chunk's panel in SUBQ quarter-slices (the block's
    sublane rows), each gated on the live ROW count (rows is a traced
    scalar; slices past the live prefix are all zero padding and cost
    nothing on the VPU)."""
    for q in range(SUBQ):
        @pl.when(base + q * SB < rows)
        def _accum(q=q):
            part = _panel_part(
                p, x_ref[q:q + 1, :], y_ref[q:q + 1, :],
                z_ref[q:q + 1, :], gm_ref[q:q + 1, :], soft,
            )
            acc_ref[0] = acc_ref[0] + part


def _far_kernel(used_ref, pos_ref, x_ref, y_ref, z_ref, gm_ref, acc_ref,
                *, soft: float):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _init():
        acc_ref[0] = jnp.zeros_like(acc_ref[0])

    # quarter-slices at/past the live super count are all padding (zero
    # mass): skip their panel math entirely (the supers array is a static
    # cap; the live count is a traced scalar)
    _gated_accum(acc_ref, pos_ref[0], x_ref, y_ref, z_ref, gm_ref,
                 j * LC, used_ref[0], soft)


def far_sweep_pallas(pos_s: jax.Array, groups, cfg: SimConfig) -> jax.Array:
    """Dense N x G monopole sweep; twin of forces.far_sweep_jnp.

    Only ceil(n_supers / SB) quarter-slices are computed (scalar-
    prefetched live count); static-cap padding costs only DMA bytes."""
    from nbody_tpu.ops.forces import soft_term

    n = pos_s.shape[0]
    b = cfg.force_tile
    g = groups.com.shape[0]
    t = n // b
    g_pad = -(-g // LC) * LC

    n_chunks = g_pad // LC

    def planar(col):
        return quarterize(jnp.pad(col, (0, g_pad - g)))    # zero padding

    gx = planar(groups.com[:, 0])
    gy = planar(groups.com[:, 1])
    gz = planar(groups.com[:, 2])
    gm = planar(groups.gmass)

    used = groups.n_supers.astype(jnp.int32).reshape(1)   # live ROW count
    pos3 = pos_s.reshape(t, b, 3)
    kernel = functools.partial(_far_kernel, soft=float(soft_term(cfg)))
    row = pl.BlockSpec((SUBQ, SB), lambda i, j, *_: (0, j),
                       memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(t, n_chunks),
        in_specs=[
            pl.BlockSpec((1, b, 3), lambda i, j, *_: (i, 0, 0), memory_space=pltpu.VMEM),
            row, row, row, row,
        ],
        out_specs=pl.BlockSpec((1, b, 3), lambda i, j, *_: (i, 0, 0), memory_space=pltpu.VMEM),
    )
    acc = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((t, b, 3), jnp.float32),
        interpret=_interpret(),
        cost_estimate=pl.CostEstimate(
            flops=18 * n * g_pad,
            bytes_accessed=(4 * g_pad * t + 2 * 3 * n) * 4,
            transcendentals=n * g_pad,
        ),
    )(used, pos3, gx, gy, gz, gm)
    return acc.reshape(n, 3)


# ---------------------------------------------------------------------------
# mid-band table sweep
# ---------------------------------------------------------------------------


def _table_kernel(nc_ref, rc_ref, pos_ref, x_ref, y_ref, z_ref, gm_ref,
                  acc_ref, *, soft: float, near_cap: int):
    # same panel math as the far sweep over PER-TARGET gathered band
    # tables (sub-monopoles + anti-parents).  The table row layout is two
    # live-prefix regions: [near anti rows (static near_cap region, live
    # prefix = near_cnt) | compacted 9-row items (up to row_cnt)], so a
    # quarter-slice executes iff it intersects either live prefix —
    # raising near_cap then costs memory, not VPU work.  (Two separate
    # (T,) prefetch arrays: a 2D (T, 2) SMEM array would be (8,128)-tiled
    # to 2 MB and overflow the 1 MB SMEM budget.)
    i = pl.program_id(0)
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _init():
        acc_ref[0] = jnp.zeros_like(acc_ref[0])

    nc = nc_ref[i]
    rc = rc_ref[i]
    p = pos_ref[0]
    for q in range(SUBQ):
        base = j * LC + q * SB
        live = (base < nc) | ((base + SB > near_cap) & (base < rc))

        @pl.when(live)
        def _accum(q=q):
            part = _panel_part(
                p, x_ref[q:q + 1, :], y_ref[q:q + 1, :],
                z_ref[q:q + 1, :], gm_ref[q:q + 1, :], soft,
            )
            acc_ref[0] = acc_ref[0] + part


def table_sweep_pallas(tgt_pos: jax.Array, tables, cfg: SimConfig) -> jax.Array:
    """Dense sweep over per-target PLANAR source tables (forces.TableSet);
    twin of forces.table_sweep_jnp.

    The kernel skips trailing all-padding quarter-slices per target via
    the TableSet's live-row counts (valid rows are compacted first)."""
    from nbody_tpu.ops.forces import soft_term

    n = tgt_pos.shape[0]
    b = cfg.force_tile
    t, s = tables.tx.shape
    assert t * b == n
    s_pad = -(-s // LC) * LC

    chunks = s_pad // LC

    def flat(col):
        if s_pad != s:
            col = jnp.pad(col, ((0, 0), (0, s_pad - s)))
        return quarterize(col.reshape(-1))

    tx = flat(tables.tx)
    ty = flat(tables.ty)
    tz = flat(tables.tz)
    tm = flat(tables.tm)
    # two live-prefix regions per target: [near_cnt live anti rows |
    # items up to row_cnt past the static near_cap boundary]
    nc = tables.near_cnt.astype(jnp.int32)
    rc = tables.row_cnt.astype(jnp.int32)

    kernel = functools.partial(_table_kernel, soft=float(soft_term(cfg)),
                               near_cap=cfg.near_cap)
    row = pl.BlockSpec((SUBQ, SB), lambda i, j, *_, c=chunks: (0, i * c + j),
                       memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(t, chunks),
        in_specs=[
            pl.BlockSpec((1, b, 3), lambda i, j, *_: (i, 0, 0), memory_space=pltpu.VMEM),
            row, row, row, row,
        ],
        out_specs=pl.BlockSpec((1, b, 3), lambda i, j, *_: (i, 0, 0), memory_space=pltpu.VMEM),
    )
    acc = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((t, b, 3), jnp.float32),
        interpret=_interpret(),
        cost_estimate=pl.CostEstimate(
            flops=18 * n * s_pad,
            bytes_accessed=(4 * t * s_pad + 2 * 3 * n) * 4,
            transcendentals=n * s_pad,
        ),
    )(nc, rc, tgt_pos.reshape(t, b, 3), tx, ty, tz, tm)
    return acc.reshape(n, 3)


# ---------------------------------------------------------------------------
# near correction
# ---------------------------------------------------------------------------


def _near_kernel(
    # scalar prefetch
    cnt_ref,             # (T,) int32 SMEM — live window counts
    # tensor inputs
    winf_ref,            # (T, 1, C) int32 HBM — aligned window starts
    winm_ref,            # (T, 1, 4*C) int32 HBM — 128-bit lane masks,
                         #   word-major: word w of window k at [w*C + k]
    pos_ref,             # (1, B, 3) VMEM — target block
    srcm_ref,            # (4, N) HBM — planar [x; y; z; mass], Morton order
    # output
    acc_ref,             # (1, B, 3) VMEM
    # scratch
    sf_smem,             # (1, C) int32 SMEM — this target's window starts
    sm_smem,             # (1, 4*C) int32 SMEM — this target's lane masks
    row_sem,             # DMA semaphores (2,)
    buf,                 # (2, 4, KSEG*WSPAN) VMEM — pipelined windows
    sem,                 # DMA semaphores (2, KSEG)
    *,
    b: int,
    cap: int,
    n_src: int,
    soft: float,
    g_const: float,
):
    """Pure P2P against DEDUPLICATED SOURCE WINDOWS: each list entry is a
    distinct WSPAN-wide aligned window of the sorted arrays plus a 128-bit
    lane-validity mask (the classifier splits child runs at window
    boundaries and OR-merges all pieces landing in the same window —
    forces._window_masks).  The DMA fetches each window exactly once;
    lanes outside the mask are zeroed.  Each loop iteration fetches a
    SEGMENT of KSEG windows (one wait round) and evaluates KSPLIT
    sub-panels.  The matching anti-child monopoles are handled by the
    band-table sweep.
    """
    i = pl.program_id(0)
    cnt = cnt_ref[i]
    n_seg = lax.div(cnt + KSEG - 1, KSEG)
    p = pos_ref[0]                       # (B, 3)
    px, py, pz = p[:, 0:1], p[:, 1:2], p[:, 2:3]
    wspan = WSPAN                        # aligned span window

    # The full window tables exceed SMEM, so each program DMAs just its
    # own rows (dynamic scalar indexing is an SMEM-only operation).  The
    # row axis is a LEADING non-tiled dim — slicing a (8,128)-tiled dim 0
    # at size 1 is a Mosaic error when the table lands in VMEM.
    f_dma = pltpu.make_async_copy(winf_ref.at[i], sf_smem, row_sem.at[0])
    m_dma = pltpu.make_async_copy(winm_ref.at[i], sm_smem, row_sem.at[1])
    f_dma.start()
    m_dma.start()
    f_dma.wait()
    m_dma.wait()

    def win_start(k):
        # window starts are SPAN_ALIGN-aligned by construction and the
        # wrapper pads the source columns to a 128 multiple, so the
        # window is always in bounds (pad entries point at window 0,
        # masked to zero lanes)
        f = sf_smem[0, jnp.minimum(k, cap - 1)]
        return pl.multiple_of(f, 128)

    def seg_dma(slot, s, j):
        k = s * KSEG + j
        return pltpu.make_async_copy(
            srcm_ref.at[:, pl.ds(win_start(k), wspan)],
            buf.at[slot, :, pl.ds(j * wspan, wspan)],
            sem.at[slot, j],
        )

    def start_seg(slot, s):
        for j in range(KSEG):
            seg_dma(slot, s, j).start()

    def wait_seg(slot, s):
        for j in range(KSEG):
            seg_dma(slot, s, j).wait()

    @pl.when(n_seg > 0)
    def _pre():
        start_seg(0, 0)

    per = KSEG // KSPLIT
    kb = per * wspan
    lane_l = jax.lax.broadcasted_iota(jnp.int32, (1, kb), 1) % wspan
    word_l = lane_l // 32                # mask word per lane (0..3)
    bit_l = lane_l % 32

    def body(s, acc):
        slot = lax.rem(s, 2)

        @pl.when(s + 1 < n_seg)
        def _next():
            start_seg(lax.rem(s + 1, 2), s + 1)

        wait_seg(slot, s)
        for half in range(KSPLIT):       # bound panel temporaries
            q = buf[slot, :, half * kb:(half + 1) * kb]   # (4, kb)
            # per-window lane validity from the 128-bit masks: select the
            # lane's word among the window's 4 scalars, then test its bit
            words = []
            for j in range(per):
                k = s * KSEG + half * per + j
                kc = jnp.minimum(k, cap - 1)
                live = k < cnt
                w0 = jnp.where(live, sm_smem[0, kc], 0)
                w1 = jnp.where(live, sm_smem[0, cap + kc], 0)
                w2 = jnp.where(live, sm_smem[0, 2 * cap + kc], 0)
                w3 = jnp.where(live, sm_smem[0, 3 * cap + kc], 0)
                qw = word_l[:, j * wspan:(j + 1) * wspan]
                wv = jnp.where(
                    qw == 0, w0,
                    jnp.where(qw == 1, w1, jnp.where(qw == 2, w2, w3)),
                )
                words.append(wv)
            word_v = jnp.concatenate(words, axis=1)        # (1, kb)
            valid = ((word_v >> bit_l) & 1) == 1
            qm = jnp.where(valid, g_const * q[3:4, :], 0.0)
            dx = q[0:1, :] - px          # (B, kb)
            dy = q[1:2, :] - py
            dz = q[2:3, :] - pz
            d2 = dx * dx + dy * dy + dz * dz
            inv = lax.rsqrt(d2 + soft)
            w = qm * (inv * inv * inv)
            ax = jnp.sum(w * dx, axis=1, keepdims=True)
            ay = jnp.sum(w * dy, axis=1, keepdims=True)
            az = jnp.sum(w * dz, axis=1, keepdims=True)
            acc = acc + jnp.concatenate([ax, ay, az], axis=1)
        return acc

    acc0 = jnp.zeros((b, 3), jnp.float32)
    acc_ref[0] = lax.fori_loop(0, n_seg, body, acc0)


def near_span_pallas(
    tgt_pos: jax.Array,
    src_pos: jax.Array,
    src_mass: jax.Array,
    win_first: jax.Array,
    win_mask: jax.Array,
    win_cnt: jax.Array,
    cfg: SimConfig,
) -> jax.Array:
    """Exact P2P against deduplicated masked near windows; twin of
    forces.near_correction_jnp.  Targets may be a slab of the sorted
    order; the source arrays and windows are global."""
    from nbody_tpu.ops.forces import soft_term

    n = tgt_pos.shape[0]
    n_src = src_pos.shape[0]
    b = cfg.force_tile
    t = n // b
    cap = win_first.shape[1]
    wspan = WSPAN

    srcm = jnp.concatenate([src_pos.T, src_mass[None, :]], axis=0)  # (4, N) planar
    # pad source columns to a 128 multiple of at least wspan so every
    # aligned window is in bounds (zero mass => no force contribution)
    n_srcp = max(-(-n_src // 128) * 128, wspan)
    if n_srcp != n_src:
        srcm = jnp.pad(srcm, ((0, 0), (0, n_srcp - n_src)))
    # HBM->SMEM row DMAs need a 128-aligned minor dimension; the row axis
    # becomes a leading non-tiled dim (see kernel comment)
    cap2 = -(-cap // 128) * 128
    if cap2 != cap:
        win_first = jnp.pad(win_first, ((0, 0), (0, cap2 - cap)))
        win_mask = jnp.pad(win_mask, ((0, 0), (0, 0), (0, cap2 - cap)))
    win_first = win_first.reshape(t, 1, cap2)
    # SMEM row DMAs are single-row: flatten the 4 mask words word-major
    win_mask = win_mask.reshape(t, 1, 4 * cap2)

    kernel = functools.partial(
        _near_kernel, b=b, cap=cap2, n_src=n_srcp,
        soft=float(soft_term(cfg)), g_const=float(cfg.g),
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(t,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, b, 3), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((1, b, 3), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.SMEM((1, cap2), jnp.int32),
            pltpu.SMEM((1, 4 * cap2), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.VMEM((2, 4, KSEG * wspan), jnp.float32),
            pltpu.SemaphoreType.DMA((2, KSEG)),
        ],
    )
    acc = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((t, b, 3), jnp.float32),
        interpret=_interpret(),
        cost_estimate=pl.CostEstimate(
            flops=18 * n * cap * wspan // 8,
            bytes_accessed=n * cap * 16 // 8,
            transcendentals=n * cap * wspan // 8,
        ),
    )(win_cnt.astype(jnp.int32),
      win_first.astype(jnp.int32), win_mask.astype(jnp.int32),
      tgt_pos.reshape(t, b, 3), srcm)
    return acc.reshape(n, 3)
