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
  * `near_span_pallas`       — exact P2P against merged near spans.  A
    near child's particles are CONTIGUOUS in the Morton-sorted arrays
    (and adjacent children are pre-merged by the classifier), so they
    arrive as 128-aligned block DMAs (KSEG spans per wait round, double
    buffered); per-target span rows are DMA'd into SMEM for scalar
    indexing.

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

# Group-monopole chunk per far-sweep step.  1024 matches XLA's 1D f32
# tiling T(1024), required for flat-array blocks.
LC = 1024

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


def _panel_part(p, x_ref, y_ref, z_ref, gm_ref, soft):
    """(B, LC) monopole panel: acceleration of targets p against one
    planar source chunk."""
    qx = x_ref[:].reshape(1, LC)
    qy = y_ref[:].reshape(1, LC)
    qz = z_ref[:].reshape(1, LC)
    qm = gm_ref[:].reshape(1, LC)
    dx = qx - p[:, 0:1]                 # (B, LC)
    dy = qy - p[:, 1:2]
    dz = qz - p[:, 2:3]
    d2 = dx * dx + dy * dy + dz * dz
    inv = lax.rsqrt(d2 + soft)
    w = qm * (inv * inv * inv)
    ax = jnp.sum(w * dx, axis=1, keepdims=True)
    ay = jnp.sum(w * dy, axis=1, keepdims=True)
    az = jnp.sum(w * dz, axis=1, keepdims=True)
    return jnp.concatenate([ax, ay, az], axis=1)


def _far_kernel(used_ref, pos_ref, x_ref, y_ref, z_ref, gm_ref, acc_ref,
                *, soft: float):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _init():
        acc_ref[0] = jnp.zeros_like(acc_ref[0])

    # chunks at/past the live super count are all padding (zero mass):
    # skip the panel math entirely (the supers array is a static cap;
    # live count is a traced scalar)
    @pl.when(j < used_ref[0])
    def _accum():
        part = _panel_part(pos_ref[0], x_ref, y_ref, z_ref, gm_ref, soft)
        acc_ref[0] = acc_ref[0] + part


def far_sweep_pallas(pos_s: jax.Array, groups, cfg: SimConfig) -> jax.Array:
    """Dense N x G monopole sweep; twin of forces.far_sweep_jnp.

    Only ceil(n_supers / LC) chunks are computed (scalar-prefetched live
    count); the static-cap padding chunks cost one skipped DMA each."""
    from nbody_tpu.ops.forces import soft_term

    n = pos_s.shape[0]
    b = cfg.force_tile
    g = groups.com.shape[0]
    t = n // b
    g_pad = -(-g // LC) * LC

    def planar(col):
        return jnp.pad(col, (0, g_pad - g))        # zero mass/com padding

    gx = planar(groups.com[:, 0])
    gy = planar(groups.com[:, 1])
    gz = planar(groups.com[:, 2])
    gm = planar(groups.gmass)

    used = ((groups.n_supers.astype(jnp.int32) + LC - 1) // LC).reshape(1)
    pos3 = pos_s.reshape(t, b, 3)
    kernel = functools.partial(_far_kernel, soft=float(soft_term(cfg)))
    n_chunks = g_pad // LC
    row = pl.BlockSpec((LC,), lambda i, j, *_: (j,), memory_space=pltpu.VMEM)
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


def _table_kernel(used_ref, pos_ref, x_ref, y_ref, z_ref, gm_ref, acc_ref,
                  *, soft: float):
    # same panel math as the far sweep over PER-TARGET gathered band
    # tables (sub-monopoles + anti-parents); rows are COMPACTED per
    # target, so chunks past this target's live row count are skipped
    i = pl.program_id(0)
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _init():
        acc_ref[0] = jnp.zeros_like(acc_ref[0])

    @pl.when(j < used_ref[i])
    def _accum():
        part = _panel_part(pos_ref[0], x_ref, y_ref, z_ref, gm_ref, soft)
        acc_ref[0] = acc_ref[0] + part


def table_sweep_pallas(
    tgt_pos: jax.Array, tables, cfg: SimConfig,
    row_cnt: jax.Array | None = None,
) -> jax.Array:
    """Dense sweep over per-target PLANAR source tables (forces.TableSet);
    twin of forces.table_sweep_jnp.

    The kernel skips trailing all-padding chunks per target via the
    TableSet's live-row counts (valid rows are compacted first)."""
    from nbody_tpu.ops.forces import soft_term

    n = tgt_pos.shape[0]
    b = cfg.force_tile
    t, s = tables.tx.shape
    assert t * b == n
    s_pad = -(-s // LC) * LC

    def flat(col):
        if s_pad != s:
            col = jnp.pad(col, ((0, 0), (0, s_pad - s)))
        return col.reshape(-1)

    chunks = s_pad // LC
    tx = flat(tables.tx)
    ty = flat(tables.ty)
    tz = flat(tables.tz)
    tm = flat(tables.tm)
    if row_cnt is None:
        row_cnt = tables.row_cnt
    used = (row_cnt.astype(jnp.int32) + LC - 1) // LC

    kernel = functools.partial(_table_kernel, soft=float(soft_term(cfg)))
    row = pl.BlockSpec((LC,), lambda i, j, *_, c=chunks: (i * c + j,),
                       memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
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
    )(used, tgt_pos.reshape(t, b, 3), tx, ty, tz, tm)
    return acc.reshape(n, 3)


# ---------------------------------------------------------------------------
# near correction
# ---------------------------------------------------------------------------


def _near_kernel(
    # scalar prefetch
    cnt_ref,             # (T,) int32 SMEM — span-list lengths
    # tensor inputs
    spanf_ref,           # (T, 1, C) int32 HBM — span starts (sorted order)
    spanc_ref,           # (T, 1, C) int32 HBM — span lengths (<= B)
    pos_ref,             # (1, B, 3) VMEM — target block
    srcm_ref,            # (4, N) HBM — planar [x; y; z; mass], Morton order
    # output
    acc_ref,             # (1, B, 3) VMEM
    # scratch
    sf_smem,             # (1, C) int32 SMEM — this target's span starts
    sc_smem,             # (1, C) int32 SMEM — this target's span lengths
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
    """Pure P2P against SOURCE SPANS: each span is a contiguous run
    [first, first+count) of the sorted arrays lying inside ONE aligned
    WSPAN-wide window (the classifier splits child runs at window
    boundaries and merges within windows — forces.SPAN_ALIGN).  The DMA
    fetches exactly that window; lanes outside [first, first+count) are
    masked.  Each loop iteration fetches a SEGMENT of KSEG windows (one
    wait round) and evaluates KSPLIT sub-panels.  The matching anti-child
    monopoles are handled by the band-table sweep.
    """
    i = pl.program_id(0)
    cnt = cnt_ref[i]
    n_seg = lax.div(cnt + KSEG - 1, KSEG)
    p = pos_ref[0]                       # (B, 3)
    px, py, pz = p[:, 0:1], p[:, 1:2], p[:, 2:3]
    wspan = WSPAN                        # aligned span window

    # The full span tables exceed SMEM, so each program DMAs just its own
    # rows (dynamic scalar indexing is an SMEM-only operation).  The row
    # axis is a LEADING non-tiled dim — slicing a (8,128)-tiled dim 0 at
    # size 1 is a Mosaic error when the table lands in VMEM.
    f_dma = pltpu.make_async_copy(spanf_ref.at[i], sf_smem, row_sem.at[0])
    c_dma = pltpu.make_async_copy(spanc_ref.at[i], sc_smem, row_sem.at[1])
    f_dma.start()
    c_dma.start()
    f_dma.wait()
    c_dma.wait()

    def span_start(k):
        # the window holding span k: spans never straddle a WSPAN
        # boundary (classifier invariant) and the wrapper pads the source
        # columns to a 128 multiple, so the window is always in bounds
        f = sf_smem[0, jnp.minimum(k, cap - 1)]
        return pl.multiple_of(f // wspan * wspan, 128)

    def seg_dma(slot, s, j):
        # list entries past cnt are zero spans — masked out in the panel
        k = s * KSEG + j
        return pltpu.make_async_copy(
            srcm_ref.at[:, pl.ds(span_start(k), wspan)],
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

    def body(s, acc):
        slot = lax.rem(s, 2)

        @pl.when(s + 1 < n_seg)
        def _next():
            start_seg(lax.rem(s + 1, 2), s + 1)

        wait_seg(slot, s)
        for half in range(KSPLIT):       # bound panel temporaries
            q = buf[slot, :, half * kb:(half + 1) * kb]   # (4, kb)
            # per-span validity: lane within [off, off+count) of its span
            offs = []
            cnts = []
            for j in range(per):
                k = s * KSEG + half * per + j
                kc = jnp.minimum(k, cap - 1)
                off = sf_smem[0, kc] - span_start(k)
                c = jnp.where(k < cnt, sc_smem[0, kc], 0)
                offs.append(jnp.full((1, wspan), off, jnp.int32))
                cnts.append(jnp.full((1, wspan), c, jnp.int32))
            off_v = jnp.concatenate(offs, axis=1)          # (1, kb)
            cnt_v = jnp.concatenate(cnts, axis=1)
            valid = (lane_l >= off_v) & (lane_l < off_v + cnt_v)
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
    span_first: jax.Array,
    span_count: jax.Array,
    span_cnt: jax.Array,
    cfg: SimConfig,
) -> jax.Array:
    """Exact P2P against merged near spans; twin of
    forces.near_correction_jnp.  Targets may be a slab of the sorted
    order; the source arrays and spans are global."""
    from nbody_tpu.ops.forces import soft_term

    n = tgt_pos.shape[0]
    n_src = src_pos.shape[0]
    b = cfg.force_tile
    t = n // b
    cap = span_first.shape[1]
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
        span_first = jnp.pad(span_first, ((0, 0), (0, cap2 - cap)))
        span_count = jnp.pad(span_count, ((0, 0), (0, cap2 - cap)))
    span_first = span_first.reshape(t, 1, cap2)
    span_count = span_count.reshape(t, 1, cap2)

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
            pltpu.SMEM((1, cap2), jnp.int32),
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
    )(span_cnt.astype(jnp.int32),
      span_first.astype(jnp.int32), span_count.astype(jnp.int32),
      tgt_pos.reshape(t, b, 3), srcm)
    return acc.reshape(n, 3)
