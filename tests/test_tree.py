"""Tree-build invariants (SURVEY.md §4's implied test strategy, made real).

Invariants checked:
  * the 2N-1 nodes' ranges form a laminar family covering [0, N)
  * preorder/escape structure: walking "always open" visits every node
    once, leaves in left-to-right order
  * node mass == sum of particle masses in its range; root mass == total
  * COM == mass-weighted mean of the range (vs float64 numpy)
  * width == root_size / 2^floor(lcp/3)
"""

import numpy as np
import jax.numpy as jnp
import pytest

from nbody_tpu.ops import bbox, morton
from nbody_tpu.ops.tree import build_tree


def _build(n, seed=0, clustered=False):
    rng = np.random.default_rng(seed)
    if clustered:
        centers = rng.uniform(-500, 500, (8, 3))
        pos = (centers[rng.integers(0, 8, n)] + rng.normal(0, 5, (n, 3))).astype(np.float32)
    else:
        pos = rng.uniform(-1000, 1000, (n, 3)).astype(np.float32)
    mass = rng.uniform(1.0, 5.0, n).astype(np.float32)
    lo, size = bbox.bounding_cube(jnp.asarray(pos))
    codes = morton.encode30(jnp.asarray(pos), lo, size)
    sc, perm = morton.morton_sort_30(codes)
    pos_s = jnp.asarray(pos)[perm]
    mass_s = jnp.asarray(mass)[perm]
    tree = build_tree(sc, pos_s, mass_s, size)
    return tree, np.asarray(sc), np.asarray(pos_s), np.asarray(mass_s), float(size)


@pytest.mark.parametrize("n,clustered", [(2, False), (3, False), (64, False),
                                         (1000, False), (1000, True), (4096, True)])
def test_structure_and_escape(n, clustered):
    tree, codes, pos_s, mass_s, size = _build(n, clustered=clustered)
    m = tree.n_nodes
    assert m == 2 * n - 1
    first = np.asarray(tree.first)[:m]
    last = np.asarray(tree.last)[:m]
    escape = np.asarray(tree.escape)[:m]
    width = np.asarray(tree.width)[:m]

    # root covers everything
    assert first[0] == 0 and last[0] == n - 1

    # "always open" walk: node k's children start at k+1; subtree of k is
    # the preorder interval [k, escape[k])
    leaves_seen = []
    for k in range(m):
        assert first[k] <= last[k]
        if first[k] == last[k]:
            assert width[k] == 0.0
            assert escape[k] == k + 1
            leaves_seen.append(first[k])
        else:
            assert escape[k] > k + 1
            # child nodes fall inside the parent's preorder interval
    assert leaves_seen == list(range(n))  # every particle exactly once, in order

    # laminar: child interval nested in parent interval
    stack = [(0, escape[0])]
    for k in range(1, m):
        while stack and k >= stack[-1][1]:
            stack.pop()
        assert stack, f"node {k} outside any ancestor interval"
        pk, pe = stack[-1]
        assert k < pe
        assert first[pk] <= first[k] and last[k] <= last[pk]
        stack.append((k, escape[k]))


@pytest.mark.parametrize("n,clustered", [(64, False), (1000, True), (4096, False)])
def test_mass_and_com(n, clustered):
    tree, codes, pos_s, mass_s, size = _build(n, clustered=clustered)
    m = tree.n_nodes
    first = np.asarray(tree.first)[:m]
    last = np.asarray(tree.last)[:m]
    mass = np.asarray(tree.mass)[:m]
    com = np.asarray(tree.com)[:m]

    p64 = pos_s.astype(np.float64)
    m64 = mass_s.astype(np.float64)
    pm = np.concatenate([[0.0], np.cumsum(m64)])
    pmx = np.concatenate([[np.zeros(3)], np.cumsum(p64 * m64[:, None], axis=0)])

    want_mass = pm[last + 1] - pm[first]
    np.testing.assert_allclose(mass, want_mass, rtol=1e-6)
    assert abs(mass[0] - m64.sum()) / m64.sum() < 1e-6

    want_com = (pmx[last + 1] - pmx[first]) / want_mass[:, None]
    np.testing.assert_allclose(com, want_com, rtol=1e-5, atol=1e-3)


def test_compensated_prefix_accuracy_large():
    # 200k particles: naive fp32 cumsum would lose small-range sums; the
    # compensated path must track float64 tightly.
    n = 200_000
    tree, codes, pos_s, mass_s, size = _build(n, seed=3)
    m = tree.n_nodes
    first = np.asarray(tree.first)[:m]
    last = np.asarray(tree.last)[:m]
    com = np.asarray(tree.com)[:m]
    mass = np.asarray(tree.mass)[:m]

    # check a sample of small nodes (the hard case) against float64
    small = np.where((last - first > 0) & (last - first < 50))[0][:200]
    p64 = pos_s.astype(np.float64)
    m64 = mass_s.astype(np.float64)
    for k in small:
        f, l = first[k], last[k]
        wm = m64[f : l + 1].sum()
        wc = (p64[f : l + 1] * m64[f : l + 1, None]).sum(0) / wm
        assert abs(mass[k] - wm) < 1e-2
        np.testing.assert_allclose(com[k], wc, atol=1e-2)


def test_width_from_prefix():
    n = 512
    tree, codes, pos_s, mass_s, size = _build(n, seed=4)
    m = tree.n_nodes
    first = np.asarray(tree.first)[:m]
    last = np.asarray(tree.last)[:m]
    width = np.asarray(tree.width)[:m]
    for k in range(m):
        f, l = first[k], last[k]
        if f == l:
            assert width[k] == 0.0
            continue
        a, b = int(codes[f]), int(codes[l])
        if a == b:
            depth = 10
        else:
            lcp = 32 - (a ^ b).bit_length() - 2
            depth = lcp // 3
        assert np.isclose(width[k], size * 2.0**-depth, rtol=1e-6), (k, f, l)


def test_duplicate_codes_ok():
    # all particles at the same point -> all codes equal; tree must still
    # be well-formed (augmented-key disambiguation)
    n = 100
    pos = jnp.zeros((n, 3), jnp.float32)
    mass = jnp.ones((n,), jnp.float32)
    lo, size = bbox.bounding_cube(pos)
    codes = morton.encode30(pos, lo, size)
    sc, perm = morton.morton_sort_30(codes)
    tree = build_tree(sc, pos[perm], mass[perm], size)
    m = tree.n_nodes
    escape = np.asarray(tree.escape)[:m]
    first = np.asarray(tree.first)[:m]
    last = np.asarray(tree.last)[:m]
    leaves = [k for k in range(m) if first[k] == last[k]]
    assert len(leaves) == n
    assert np.isclose(float(tree.mass[0]), n)
