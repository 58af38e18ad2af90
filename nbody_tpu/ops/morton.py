"""Morton (Z-order) codes — fully vectorized jnp, no host loops.

Two encoders, matching the two generations of the reference:

* 30-bit (10 bits/axis, uint32): the v5 encoder (nbody_v5.cu:57-78),
  bit layout ``(X << 2) | (Y << 1) | Z`` with X from the x-axis.
* 63-bit (21 bits/axis): the legacy nbody/nbody_bh encoder (64-bit keys —
  ``unsigned long long`` in the mangled symbol
  ``_Z24computeMortonCodesKernelPKfS0_S0_PyPii``; basics.txt:125-134).
  Emitted as a (hi32, lo32) uint32 pair so it works without jax x64 mode.

Quantization matches nbody_v5.cu:71-76: coordinates scaled against the
*cubified* AABB with a single `size` for all axes, scaled by (2^bits - 1).
We additionally clamp to the valid lattice — the reference relies on
floating-point luck for particles exactly on the max face.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

_U = jnp.uint32


def expand_bits(v: jax.Array) -> jax.Array:
    """Dilate the low 11 bits of uint32 `v`: bit i -> bit 3i.

    Same magic-number sequence as the reference's __device__ expandBits
    (nbody_v5.cu:57-64); verified exhaustively for 11-bit inputs.
    """
    v = jnp.asarray(v, _U)
    v = (v * _U(0x00010001)) & _U(0xFF0000FF)
    v = (v * _U(0x00000101)) & _U(0x0F00F00F)
    v = (v * _U(0x00000011)) & _U(0xC30C30C3)
    v = (v * _U(0x00000005)) & _U(0x49249249)
    return v


def quantize(pos: jax.Array, lo: jax.Array, size: jax.Array, bits: int) -> jax.Array:
    """[N,3] float positions -> [N,3] uint32 lattice coords in [0, 2^bits-1]."""
    scale = jnp.float32(2**bits - 1)
    q = (pos - lo) / size * scale
    q = jnp.clip(q, 0.0, scale)
    return q.astype(_U)


def encode30(pos: jax.Array, lo: jax.Array, size: jax.Array) -> jax.Array:
    """v5-parity 30-bit Morton codes as uint32 [N]."""
    q = quantize(pos, lo, size, 10)
    x, y, z = q[:, 0], q[:, 1], q[:, 2]
    return (expand_bits(x) << 2) | (expand_bits(y) << 1) | expand_bits(z)


def _dilate21(v: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Dilate 21-bit `v` into 63 bits, returned as (hi32, lo32).

    Split: low 11 bits dilate to bits 0..30 (lo word); high 10 bits dilate
    to bits 33..60, i.e. hi word << 1.
    """
    v = jnp.asarray(v, _U)
    d_lo = expand_bits(v & _U(0x7FF))
    d_hi = expand_bits(v >> 11)
    return d_hi << 1, d_lo


def _shl64(hi: jax.Array, lo: jax.Array, s: int) -> Tuple[jax.Array, jax.Array]:
    """(hi,lo) uint32 pair << s, for 0 < s < 32."""
    return (hi << s) | (lo >> (32 - s)), lo << s


def encode63(pos: jax.Array, lo: jax.Array, size: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Legacy-parity 63-bit Morton codes as (hi32, lo32) uint32 pairs [N].

    Layout mirrors the v5 convention at 21 bits/axis:
    code = (X_dilated << 2) | (Y_dilated << 1) | Z_dilated.
    """
    q = quantize(pos, lo, size, 21)
    xh, xl = _shl64(*_dilate21(q[:, 0]), 2)
    yh, yl = _shl64(*_dilate21(q[:, 1]), 1)
    zh, zl = _dilate21(q[:, 2])
    return xh | yh | zh, xl | yl | zl


def morton_sort_30(codes: jax.Array, n_valid: int | None = None):
    """Sort (codes, 0..N-1) ascending; returns (sorted_codes, perm).

    Replaces thrust::sort_by_key (nbody_v5.cu:304-306) with XLA's on-device
    sort.
    """
    n = codes.shape[0]
    idx = jnp.arange(n, dtype=jnp.int32)
    sc, perm = jax.lax.sort_key_val(codes, idx)
    return sc, perm


def morton_sort_63(hi: jax.Array, lo: jax.Array):
    """Lexicographic sort on (hi, lo) pairs; replaces cub::DeviceRadixSort
    on u64 keys (symbols in nbody_bh.exe)."""
    n = hi.shape[0]
    idx = jnp.arange(n, dtype=jnp.int32)
    shi, slo, perm = jax.lax.sort((hi, lo, idx), num_keys=2)
    return shi, slo, perm
