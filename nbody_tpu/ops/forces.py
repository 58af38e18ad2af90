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
#   * NEAR FIELD: for the ~dozens of groups per target that FAIL the
#     group-level MAC  diam / sqrt(gap^2 + soft) < theta  (gap = distance
#     from the source COM to the target group's bounding sphere), the
#     monopole is wrong — so a correction kernel adds the exact O(B x B)
#     particle-particle interaction and SUBTRACTS the monopole the far
#     sweep already added.  Source particles of a group are CONTIGUOUS in
#     the sorted order, so the Pallas kernel fetches them with block DMAs,
#     never gathers.
#
# Accuracy: every source region either satisfies the conservative MAC for
# all particles of the target group (monopole error <= the reference's
# per-particle theta test, nbody_v5.cu:232) or is computed exactly.
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


def make_group_info(pos_s: jax.Array, mass_s: jax.Array, cfg: SimConfig) -> GroupInfo:
    """Dense per-block reductions; requires len % force_tile == 0."""
    b = cfg.force_tile
    g = pos_s.shape[0] // b
    p3 = pos_s.reshape(g, b, 3)
    m2 = mass_s.reshape(g, b)
    msum = jnp.sum(m2, axis=1)
    com = jnp.sum(p3 * m2[..., None], axis=1) / jnp.maximum(msum, 1e-20)[:, None]
    lo = jnp.min(p3, axis=1)
    hi = jnp.max(p3, axis=1)
    return GroupInfo(
        com=com,
        gmass=cfg.g * msum,
        center=0.5 * (lo + hi),
        radius=0.5 * jnp.linalg.norm(hi - lo, axis=1),
        diam=jnp.linalg.norm(hi - lo, axis=1),
    )


def near_group_lists(groups: GroupInfo, cfg: SimConfig) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """For each target group, the source groups failing the conservative
    MAC (including itself).  Dense (G x G) panels -> row-compacted index
    lists [G, near_cap] padded with G (an all-zero virtual group).

    Returns (near_idx, near_cnt, overflowed).
    """
    g = groups.com.shape[0]
    cap = cfg.near_cap
    soft = soft_term(cfg)
    theta = cfg.theta

    d = groups.com[None, :, :] - groups.center[:, None, :]      # [Gt, Gs, 3]
    gap = jnp.maximum(
        jnp.sqrt(jnp.sum(d * d, axis=-1)) - groups.radius[:, None], 0.0
    )
    dist = jnp.sqrt(gap * gap + soft)
    fail = groups.diam[None, :] / dist >= theta                  # [Gt, Gs]

    fi = fail.astype(_I32)
    pos_in = jnp.cumsum(fi, axis=1) - fi
    cnt = jnp.sum(fi, axis=1)
    overflow = jnp.any(cnt > cap)
    rows = jnp.arange(g, dtype=_I32)[:, None]
    dest = jnp.where(fail & (pos_in < cap), pos_in, cap)
    src = jnp.broadcast_to(jnp.arange(g, dtype=_I32)[None, :], (g, g))
    near = jnp.full((g, cap + 1), g, _I32).at[rows, dest].set(
        jnp.where(fail, src, g), mode="drop"
    )[:, :cap]
    return near, jnp.minimum(cnt, cap), overflow


def far_sweep_jnp(pos_s: jax.Array, groups: GroupInfo, cfg: SimConfig) -> jax.Array:
    """Dense N x G monopole forces (jnp twin of the Pallas kernel)."""
    soft = soft_term(cfg)
    b = cfg.force_tile
    g = groups.com.shape[0]
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
    """Exact P2P minus the already-applied monopole, for every near source
    group (jnp twin of the Pallas kernel; gathers — CPU/tests only).

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
    # virtual padding group g: zero mass
    com_x = jnp.concatenate([groups.com, jnp.zeros((1, 3))])
    gm_x = jnp.concatenate([groups.gmass, jnp.zeros((1,))])

    def one(args):
        pb, idx = args                       # [B,3], [C]
        ic = jnp.clip(idx, 0, g - 1)
        q = p3[ic].reshape(-1, 3)            # [C*B, 3] source particles
        qm = jnp.where(idx[:, None] < g, m2[ic], 0.0).reshape(-1)
        exact = _panel_accel(pb, q, qm, cfg.g, soft)
        mono = _panel_accel(pb, com_x[idx], gm_x[idx], 1.0, soft)
        return exact - mono

    acc = lax.map(one, (tp3, near_idx))
    return acc.reshape(n, 3)


def bh_forces_grouped(pos_s: jax.Array, mass_s: jax.Array, cfg: SimConfig) -> jax.Array:
    """Production Barnes-Hut forces on Morton-sorted, group-padded arrays.

    far monopole sweep + near P2P correction; Pallas kernels on TPU.
    """
    groups = make_group_info(pos_s, mass_s, cfg)
    near_idx, near_cnt, _ = near_group_lists(groups, cfg)
    if cfg.use_pallas:
        from nbody_tpu.ops.pallas.forces import far_sweep_pallas, near_correction_pallas

        far = far_sweep_pallas(pos_s, groups, cfg)
        corr = near_correction_pallas(
            pos_s, pos_s, mass_s, groups, near_idx, near_cnt, cfg
        )
    else:
        far = far_sweep_jnp(pos_s, groups, cfg)
        corr = near_correction_jnp(pos_s, pos_s, mass_s, groups, near_idx, cfg)
    return far + corr
