"""Morton encoder unit tests against a pure-Python bit-interleave oracle."""

import numpy as np
import jax.numpy as jnp
import pytest

from nbody_tpu.ops import morton, bbox


def _py_dilate(v: int, nbits: int) -> int:
    out = 0
    for i in range(nbits):
        out |= ((v >> i) & 1) << (3 * i)
    return out


def _py_morton(x: int, y: int, z: int, nbits: int) -> int:
    return (_py_dilate(x, nbits) << 2) | (_py_dilate(y, nbits) << 1) | _py_dilate(z, nbits)


def test_expand_bits_matches_oracle_11bit():
    v = np.arange(2**11, dtype=np.uint32)
    got = np.asarray(morton.expand_bits(jnp.asarray(v)))
    want = np.array([_py_dilate(int(x), 11) for x in v], dtype=np.uint32)
    np.testing.assert_array_equal(got, want)


def test_encode30_matches_oracle():
    rng = np.random.default_rng(0)
    q = rng.integers(0, 1024, size=(200, 3))
    # positions that quantize exactly to q on a unit lattice
    pos = (q.astype(np.float64) + 0.5) / 1023.0
    lo = jnp.zeros(3)
    size = jnp.float32(1.0 + 1.0 / 1023.0 * 0.0)  # quantize scale ~ q
    codes = np.asarray(morton.encode30(jnp.asarray(pos, jnp.float32), lo, jnp.float32(1.0)))
    want = np.array(
        [_py_morton(int(a), int(b), int(c), 10) for a, b, c in q], dtype=np.uint32
    )
    # (q + 0.5)/1023 * 1023 = q + 0.5 -> truncates to q
    np.testing.assert_array_equal(codes, want)


def test_encode30_axis_order_matches_v5():
    # v5 layout: (X << 2) | (Y << 1) | Z  (nbody_v5.cu:76)
    lo = jnp.zeros(3)
    size = jnp.float32(1.0)
    px = morton.encode30(jnp.asarray([[1.0, 0.0, 0.0]]), lo, size)[0]
    py = morton.encode30(jnp.asarray([[0.0, 1.0, 0.0]]), lo, size)[0]
    pz = morton.encode30(jnp.asarray([[0.0, 0.0, 1.0]]), lo, size)[0]
    assert int(px) == _py_dilate(1023, 10) << 2
    assert int(py) == _py_dilate(1023, 10) << 1
    assert int(pz) == _py_dilate(1023, 10)


def test_encode63_matches_oracle():
    rng = np.random.default_rng(1)
    q = rng.integers(0, 2**21, size=(100, 3))
    pos = q.astype(np.float64) / (2**21 - 1)
    hi, lo_ = morton.encode63(jnp.asarray(pos, jnp.float32), jnp.zeros(3), jnp.float32(1.0))
    got = (np.asarray(hi).astype(np.uint64) << np.uint64(32)) | np.asarray(lo_).astype(np.uint64)
    # fp32 quantization wobbles the lattice point; recompute expected from
    # the actual float path
    qf = np.clip(
        (pos.astype(np.float32) * np.float32(2**21 - 1)), 0, 2**21 - 1
    ).astype(np.uint64)
    want = np.array(
        [_py_morton(int(a), int(b), int(c), 21) for a, b, c in qf], dtype=np.uint64
    )
    np.testing.assert_array_equal(got, want)


def test_morton_order_is_monotone_per_axis():
    # codes must increase along each axis when other coords fixed
    xs = np.linspace(0.01, 0.99, 50)
    pos = np.stack([xs, np.full(50, 0.5), np.full(50, 0.5)], axis=1)
    codes = np.asarray(
        morton.encode30(jnp.asarray(pos, jnp.float32), jnp.zeros(3), jnp.float32(1.0))
    )
    # Morton codes are not monotone in value, but equal-prefix blocks are;
    # check the weaker, correct property: quantized x increases
    x_of = [(int(c) >> 2) & 0x49249249 for c in codes]
    dec = [sum(((v >> (3 * i)) & 1) << i for i in range(10)) for v in x_of]
    assert all(b >= a for a, b in zip(dec, dec[1:]))


def test_sort30():
    rng = np.random.default_rng(2)
    pos = rng.uniform(-100, 100, (1000, 3)).astype(np.float32)
    lo, size = bbox.bounding_cube(jnp.asarray(pos))
    codes = morton.encode30(jnp.asarray(pos), lo, size)
    sc, perm = morton.morton_sort_30(codes)
    sc = np.asarray(sc)
    assert np.all(np.diff(sc.astype(np.int64)) >= 0)
    np.testing.assert_array_equal(np.sort(np.asarray(perm)), np.arange(1000))
    np.testing.assert_array_equal(np.asarray(codes)[np.asarray(perm)], sc)


def test_bounding_cube_matches_v5_semantics():
    pos = jnp.asarray(
        [[-1.0, 0.0, 2.0], [3.0, 1.0, 2.5]], jnp.float32
    )
    lo, size = bbox.bounding_cube(pos)
    np.testing.assert_allclose(np.asarray(lo), [-1.0, 0.0, 2.0])
    assert float(size) == 4.0  # max extent (x)


def test_bounding_cube_min_size_one():
    pos = jnp.zeros((5, 3), jnp.float32)
    _, size = bbox.bounding_cube(pos)
    assert float(size) == 1.0  # fmaxf(..., 1.0f) guard (nbody_v5.cu:72)


def test_63bit_sort_order_nests_30bit_truncation():
    """Regression: the production pipeline derives 30-bit codes for the
    cell build from the TOP 30 BITS of the 63-bit sort keys (hi >> 1).
    Truncation nests (prefix of the sort key), so the 63-bit order is
    also sorted for them — unlike re-encoding at 10-bit quantization,
    whose lattice differs and yields thousands of inversions."""
    rng = np.random.default_rng(7)
    pos = jnp.asarray(rng.uniform(-900, 900, (5000, 3)).astype(np.float32))
    lo, size = bbox.bounding_cube(pos)
    hi, lo32 = morton.encode63(pos, lo, size)
    shi, slo, perm = morton.morton_sort_63(hi, lo32)
    codes30 = np.asarray((shi >> 1) & jnp.uint32(0x3FFFFFFF))
    assert np.all(np.diff(codes30.astype(np.int64)) >= 0)
    # and the truncated code is the Morton code of the >>11 lattice coords
    from nbody_tpu.ops.morton import quantize, expand_bits

    q = np.asarray(quantize(pos, lo, size, 21))[np.asarray(perm)] >> 11
    want = (
        (np.asarray(expand_bits(jnp.asarray(q[:, 0]))) << 2)
        | (np.asarray(expand_bits(jnp.asarray(q[:, 1]))) << 1)
        | np.asarray(expand_bits(jnp.asarray(q[:, 2])))
    )
    np.testing.assert_array_equal(codes30, want)
