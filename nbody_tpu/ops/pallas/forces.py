"""Pallas TPU kernels for the two-level dense Barnes-Hut force path.

Replaces the CUDA computeForceKernel's gather-heavy per-thread tree walk
(nbody_v5.cu:215-249) with two dense kernels (see ops/forces.py for the
decomposition and why: XLA gather costs ~5-10 ns/element on TPU, so the
TPU-native design never gathers on the hot path):

  * `far_sweep_pallas`      — every particle block (B x 3) against every
    group monopole, streamed as flat planar chunks of the (G x 4) group
    table.  Pure dense VPU panels.
  * `near_correction_pallas` — for each target group, loop over its
    MAC-failing source groups (indices scalar-prefetched into SMEM); each
    source group's particles are CONTIGUOUS in the Morton-sorted arrays,
    so they arrive via block DMA from HBM, double-buffered.  The kernel
    adds the exact (B x B) particle-particle panel and subtracts the
    monopole the far sweep already applied.

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


def _interpret() -> bool:
    return jax.default_backend() not in ("tpu", "axon")


# ---------------------------------------------------------------------------
# far sweep
# ---------------------------------------------------------------------------


def _far_kernel(pos_ref, x_ref, y_ref, z_ref, gm_ref, acc_ref, *, soft: float):
    j = pl.program_id(1)
    p = pos_ref[0]                      # (B, 3)
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
    part = jnp.concatenate([ax, ay, az], axis=1)   # (B, 3)

    @pl.when(j == 0)
    def _init():
        acc_ref[0] = part

    @pl.when(j > 0)
    def _accum():
        acc_ref[0] = acc_ref[0] + part


def far_sweep_pallas(pos_s: jax.Array, groups, cfg: SimConfig) -> jax.Array:
    """Dense N x G monopole sweep; twin of forces.far_sweep_jnp."""
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

    pos3 = pos_s.reshape(t, b, 3)
    kernel = functools.partial(_far_kernel, soft=float(soft_term(cfg)))
    n_chunks = g_pad // LC
    row = pl.BlockSpec((LC,), lambda i, j: (j,), memory_space=pltpu.VMEM)
    acc = pl.pallas_call(
        kernel,
        grid=(t, n_chunks),
        in_specs=[
            pl.BlockSpec((1, b, 3), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            row, row, row, row,
        ],
        out_specs=pl.BlockSpec((1, b, 3), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((t, b, 3), jnp.float32),
        interpret=_interpret(),
        cost_estimate=pl.CostEstimate(
            flops=18 * n * g_pad,
            bytes_accessed=(4 * g_pad * t + 2 * 3 * n) * 4,
            transcendentals=n * g_pad,
        ),
    )(pos3, gx, gy, gz, gm)
    return acc.reshape(n, 3)


# ---------------------------------------------------------------------------
# near correction
# ---------------------------------------------------------------------------


def _near_kernel(
    # scalar prefetch
    near_ref,            # (G, C) int32 in SMEM
    cnt_ref,             # (G,)   int32 in SMEM
    # tensor inputs
    pos_ref,             # (1, B, 3) VMEM — target block
    srcm_ref,            # (4, N) HBM — planar [x; y; z; mass], Morton order
    mono_ref,            # (G, 4) VMEM — packed [comx comy comz gmass]
    # output
    acc_ref,             # (1, B, 3) VMEM
    # scratch
    buf,                 # (2, B, 4) VMEM — double-buffered source blocks
    sem,                 # DMA semaphores (2,)
    *,
    b: int,
    cap: int,
    soft: float,
    g_const: float,
):
    i = pl.program_id(0)
    cnt = cnt_ref[i]
    p = pos_ref[0]                       # (B, 3)
    px, py, pz = p[:, 0:1], p[:, 1:2], p[:, 2:3]

    def start_dma(slot, k):
        h = near_ref[i, k]
        return pltpu.make_async_copy(
            srcm_ref.at[:, pl.ds(h * b, b)],   # (4, B) planar slice
            buf.at[slot],
            sem.at[slot],
        )

    @pl.when(cnt > 0)
    def _prefetch():
        start_dma(0, 0).start()

    def body(k, acc):
        slot = lax.rem(k, 2)

        @pl.when(k + 1 < cnt)
        def _next():
            start_dma(lax.rem(k + 1, 2), k + 1).start()

        start_dma(slot, k).wait()
        q = buf[slot]                    # (4, B), rows already lane-major
        qx = q[0:1, :]
        qy = q[1:2, :]
        qz = q[2:3, :]
        qm = g_const * q[3:4, :]

        dx = qx - px                     # (B, B)
        dy = qy - py
        dz = qz - pz
        d2 = dx * dx + dy * dy + dz * dz
        inv = lax.rsqrt(d2 + soft)
        w = qm * (inv * inv * inv)
        ax = jnp.sum(w * dx, axis=1, keepdims=True)
        ay = jnp.sum(w * dy, axis=1, keepdims=True)
        az = jnp.sum(w * dz, axis=1, keepdims=True)

        # subtract the monopole already applied by the far sweep
        h = near_ref[i, k]
        mono = mono_ref[pl.ds(h, 1), :]  # (1, 4)
        mdx = mono[0, 0] - px            # (B, 1)
        mdy = mono[0, 1] - py
        mdz = mono[0, 2] - pz
        md2 = mdx * mdx + mdy * mdy + mdz * mdz
        minv = lax.rsqrt(md2 + soft)
        mw = mono[0, 3] * (minv * minv * minv)   # (B, 1)

        part = jnp.concatenate(
            [ax - mw * mdx, ay - mw * mdy, az - mw * mdz], axis=1
        )                                 # (B, 3)
        return acc + part

    acc0 = jnp.zeros((b, 3), jnp.float32)
    acc_ref[0] = lax.fori_loop(0, cnt, body, acc0)


def near_correction_pallas(
    tgt_pos: jax.Array,
    src_pos: jax.Array,
    src_mass: jax.Array,
    groups,
    near_idx: jax.Array,
    near_cnt: jax.Array,
    cfg: SimConfig,
) -> jax.Array:
    """Exact-P2P-minus-monopole correction for MAC-failing source groups;
    twin of forces.near_correction_jnp.  Targets may be a slab of the
    sorted order; sources/groups are global."""
    from nbody_tpu.ops.forces import soft_term

    n = tgt_pos.shape[0]
    b = cfg.force_tile
    g = groups.com.shape[0]
    t = n // b
    cap = near_idx.shape[1]

    srcm = jnp.concatenate([src_pos.T, src_mass[None, :]], axis=0)  # (4, N) planar
    mono = jnp.concatenate([groups.com, groups.gmass[:, None]], axis=1)  # (G, 4)
    # clamp padding entries (== g) to a real index; they never execute
    # because k < cnt, but keep the DMA address space valid regardless
    near_safe = jnp.minimum(near_idx, g - 1)

    kernel = functools.partial(
        _near_kernel, b=b, cap=cap, soft=float(soft_term(cfg)), g_const=float(cfg.g)
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(t,),
        in_specs=[
            pl.BlockSpec((1, b, 3), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, b, 3), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, 4, b), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    acc = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((t, b, 3), jnp.float32),
        interpret=_interpret(),
        cost_estimate=pl.CostEstimate(
            flops=2 * 18 * n * cap * b // 4,
            bytes_accessed=n * cap * 16 // 4,
            transcendentals=n * cap * b // 4,
        ),
    )(near_safe.astype(jnp.int32), near_cnt.astype(jnp.int32),
      tgt_pos.reshape(t, b, 3), srcm, mono)
    return acc.reshape(n, 3)
