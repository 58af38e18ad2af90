"""Functional octree construction from sorted Morton codes.

This replaces the reference's entire mutating tree machinery — the atomic
top-down insertion build (nbody_v5.cu:98-156 `insertParticlesKernel` with
its 1024-particle host-driven batches, nbody_v5.cu:311-317), the legacy
serial `buildOctreeSimpleKernel<<<1,1>>>` (basics.txt:27-45), the atomicAdd
leaf-to-root COM pass (nbody_v5.cu:182-213), and the 76 MB/step node-pool
memset (nbody_v5.cu:308) — with a fully vectorized, deterministic,
fixed-shape pipeline:

1.  A Karras-style binary radix tree over the sorted Morton codes.  Every
    internal node is an index range [first, last] of sorted particles; the
    ranges are found with a vectorized binary search on longest-common-
    prefix lengths (duplicate codes are disambiguated by sorted position,
    the standard "augmented key" trick).  No atomics, no host round-trips,
    no `nodeCounter` D2H sync (nbody_v5.cu:319-320 has no analog here).
2.  Node mass and center of mass from compensated prefix sums over the
    sorted particle arrays: mass(node) = P[last+1] - P[first].  Exact
    range sums, O(N) work, deterministic — the TPU answer to
    computeCOMKernel's atomicAdd race tolerance.
3.  A DFS-preorder linearization with *escape indices* ("ropes").  For a
    laminar family of ranges, preorder = lexicographic order by
    (first asc, length desc), so one 2-key sort linearizes the tree.  A
    traversal then needs no stack (the CUDA kernel burns 64 registers on
    one, nbody_v5.cu:221): accept a node -> jump to its escape index,
    open it -> step to +1.

The per-node cell width used by the theta criterion is derived from the
common Morton prefix of the node's range: a node whose codes share 3*d
bits lies inside a depth-d octree cell of width root_size / 2^d — the
same cell geometry the reference stores explicitly per node
(nbody_v5.cu:23-31, fields min*/max*).
"""

from __future__ import annotations

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from nbody_tpu.ops import compensated as comp

_I32 = jnp.int32
_U32 = jnp.uint32


class LinearTree(NamedTuple):
    """Escape-linearized tree, padded to 2N entries (2N-1 real nodes).

    Entry layout is DFS preorder: entry k's first child is k+1; `escape[k]`
    is the preorder index just past k's subtree.  Leaves carry the particle
    itself (width 0, com = position) so the traversal needs a single
    accept rule `width / dist < theta` — a leaf is always accepted and a
    particle's own leaf contributes exactly zero force (d = 0).  The final
    padding entry has mass 0 / width 0 and is the scatter target for
    interaction-list padding.

    Node capacity is 2N, matching the reference's own bound
    (nbody_v5.cu:426 allocates 2N OctreeNodes).
    """

    com: jax.Array      # [2N, 3] float32 — center of mass (leaf: position)
    mass: jax.Array     # [2N]    float32 — subtree mass (leaf: particle mass)
    width: jax.Array    # [2N]    float32 — containing octree-cell width (leaf: 0)
    escape: jax.Array   # [2N]    int32   — preorder index past the subtree
    first: jax.Array    # [2N]    int32   — sorted-particle range start
    last: jax.Array     # [2N]    int32   — sorted-particle range end, inclusive
    parent: jax.Array   # [2N]    int32   — preorder parent (-1 for root/pad)

    @property
    def n_nodes(self) -> int:
        """Real node count 2N-1 (static)."""
        return self.com.shape[0] - 1

    @property
    def n_particles(self) -> int:
        return self.com.shape[0] // 2


def _clz(x: jax.Array) -> jax.Array:
    return lax.clz(x.astype(_U32)).astype(_I32)


def _delta(mc: jax.Array, n: int, i: jax.Array, j: jax.Array) -> jax.Array:
    """LCP length between augmented keys at sorted positions i and j.

    Keys are conceptually (morton << 32) | position, so equal Morton codes
    fall through to the position bits: delta = 32 + clz(i ^ j).  Out-of-
    range j yields -1 (smaller than any real LCP).
    """
    valid = (j >= 0) & (j < n)
    jc = jnp.clip(j, 0, n - 1)
    a = mc[i]
    b = mc[jc]
    pos_lcp = 32 + _clz(i.astype(_U32) ^ jc.astype(_U32))
    code_lcp = _clz(a ^ b)
    d = jnp.where(a == b, pos_lcp, code_lcp)
    return jnp.where(valid, d, -1)


def _internal_ranges(mc: jax.Array, n: int):
    """Vectorized Karras ranges: for internal node i in [0, n-2], the sorted
    index range [first, last] it covers.

    Uses the monotonicity of LCP along sorted order: delta(i, i + l*d) is
    non-increasing in l, so the range extent is one binary search — no
    doubling phase needed.
    """
    i = jnp.arange(n - 1, dtype=_I32)
    d_next = _delta(mc, n, i, i + 1)
    d_prev = _delta(mc, n, i, i - 1)
    d = jnp.where(d_next > d_prev, _I32(1), _I32(-1))
    delta_min = jnp.minimum(d_next, d_prev)

    k_bits = max(1, math.ceil(math.log2(n)))
    l = jnp.zeros_like(i)
    for k in range(k_bits, -1, -1):
        t = _I32(1 << k)
        cand = l + t
        go = _delta(mc, n, i, i + cand * d) > delta_min
        l = jnp.where(go, cand, l)
    j = i + l * d
    return jnp.minimum(i, j), jnp.maximum(i, j)


def _cell_width(mc: jax.Array, first: jax.Array, last: jax.Array, root_size: jax.Array) -> jax.Array:
    """Width of the tightest octree cell containing a code range.

    30-bit codes live in the low bits of a uint32, so clz(a^b) >= 2 and the
    shared *code* prefix is clz - 2 bits; every 3 shared bits is one octree
    level.  Equal codes mean the range sits inside a finest-level (depth
    10) cell.
    """
    a = mc[first]
    b = mc[last]
    prefix_bits = jnp.where(a == b, _I32(30), _clz(a ^ b) - 2)
    depth = prefix_bits // 3
    return root_size * jnp.exp2(-depth.astype(jnp.float32))


def build_tree(
    mc_sorted: jax.Array,
    pos_sorted: jax.Array,
    mass_sorted: jax.Array,
    root_size: jax.Array,
) -> LinearTree:
    """Build the escape-linearized Barnes-Hut tree.

    Args:
      mc_sorted:  [N] uint32 sorted 30-bit Morton codes.
      pos_sorted: [N, 3] float32 positions in the same order.
      mass_sorted:[N] float32 masses in the same order.
      root_size:  scalar — cubified AABB side (bbox.bounding_cube).

    Requires N >= 2 (use the direct-force path below that).
    """
    n = mc_sorted.shape[0]
    if n < 2:
        raise ValueError("build_tree requires at least 2 particles")
    m_nodes = 2 * n - 1

    first_int, last_int = _internal_ranges(mc_sorted, n)
    leaf_idx = jnp.arange(n, dtype=_I32)
    first_all = jnp.concatenate([first_int, leaf_idx])
    last_all = jnp.concatenate([last_int, leaf_idx])

    # --- DFS preorder: sort by (first asc, length desc). ---
    length = last_all - first_all + 1
    k2 = jnp.asarray(n, _I32) - length
    _, _, p = lax.sort((first_all, k2, jnp.arange(m_nodes, dtype=_I32)), num_keys=2)
    inv = jnp.zeros((m_nodes,), _I32).at[p].set(jnp.arange(m_nodes, dtype=_I32))
    leaf_pre = inv[n - 1 + leaf_idx]          # preorder position of leaf j

    # --- node attributes (in concatenated order), then gather to preorder ---
    ph_m, pl_m = comp.prefix_sums(mass_sorted)
    mass_int = comp.range_sum(ph_m, pl_m, first_int, last_int)
    wpos = pos_sorted * mass_sorted[:, None]
    com_cols = []
    for c in range(3):
        ph, plo = comp.prefix_sums(wpos[:, c])
        com_cols.append(comp.range_sum(ph, plo, first_int, last_int))
    msum = jnp.stack(com_cols, axis=1)
    # finalizeCOMKernel guard (nbody_v5.cu:205): divide only when mass > 1e-6.
    safe = mass_int > 1e-6
    com_int = jnp.where(safe[:, None], msum / jnp.maximum(mass_int, 1e-6)[:, None], 0.0)
    width_int = _cell_width(mc_sorted, first_int, last_int, jnp.asarray(root_size, jnp.float32))

    com_all = jnp.concatenate([com_int, pos_sorted])
    mass_all = jnp.concatenate([mass_int, mass_sorted])
    width_all = jnp.concatenate([width_int, jnp.zeros((n,), jnp.float32)])

    pre_com = com_all[p]
    pre_mass = mass_all[p]
    pre_width = width_all[p]
    pre_first = first_all[p]
    pre_last = last_all[p]
    pre_escape = leaf_pre[pre_last] + 1

    # Parent pointers by scattering from children: in preorder an internal
    # node k's children are k+1 and escape[k+1].
    ks = jnp.arange(m_nodes, dtype=_I32)
    internal = pre_first < pre_last
    c1 = jnp.where(internal, ks + 1, m_nodes)           # m_nodes = drop slot
    esc_c1 = pre_escape[jnp.clip(ks + 1, 0, m_nodes - 1)]
    c2 = jnp.where(internal, esc_c1, m_nodes)
    pre_parent = (
        jnp.full((m_nodes + 1,), -1, _I32)
        .at[c1].set(jnp.where(internal, ks, -1), mode="drop")
        .at[c2].set(jnp.where(internal, ks, -1), mode="drop")
    )[:m_nodes]

    # --- pad to 2N with an inert entry (mass 0, escape past the end) ---
    pad_f = jnp.zeros((1, 3), jnp.float32)
    return LinearTree(
        com=jnp.concatenate([pre_com, pad_f]),
        mass=jnp.concatenate([pre_mass, jnp.zeros((1,), jnp.float32)]),
        width=jnp.concatenate([pre_width, jnp.zeros((1,), jnp.float32)]),
        escape=jnp.concatenate([pre_escape, jnp.full((1,), m_nodes + 1, _I32)]),
        first=jnp.concatenate([pre_first, jnp.zeros((1,), _I32)]),
        last=jnp.concatenate([pre_last, jnp.zeros((1,), _I32)]),
        parent=jnp.concatenate([pre_parent, jnp.full((1,), -1, _I32)]),
    )
