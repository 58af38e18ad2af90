"""A/B the _window_masks pack stage on TPU: packed 1-key sort + 4
take_along_axis gathers (current) vs the 5-operand sort (previous), on
realistic classify-shaped inputs.  Usage: _prof_winmask.py [rows] [k]
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import sys, time
import numpy as np
import jax, jax.numpy as jnp
from jax import lax
from nbody_tpu.ops.forces import (
    _window_masks, _lowmask, SPAN_ALIGN, _I32,
)
from nbody_tpu.utils.profiling import _sync

R = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
K = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
WIN_CAP = int(sys.argv[3]) if len(sys.argv) > 3 else 128

rng = np.random.default_rng(0)
cnt_live = rng.integers(60, 200, size=R)
first = np.zeros((R, K), np.int32)
count = np.zeros((R, K), np.int32)
for i in range(R):
    c = cnt_live[i]
    starts = np.sort(rng.choice(900_000, size=c, replace=False)) * 1
    lens = rng.integers(4, 60, size=c)
    # make disjoint ascending
    starts = np.cumsum(lens + rng.integers(1, 50, size=c))
    first[i, :c] = starts
    count[i, :c] = lens
first = jnp.asarray(first); count = jnp.asarray(count)


def timed(label, fn, *args, iters=6):
    f = jax.jit(fn)
    out = f(*args); _sync(out[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*args)
    _sync(out[0])
    print(f"{label:28s}", end="", flush=True) or print(f" {(time.perf_counter()-t0)*1e3/iters:8.2f} ms", flush=True)
    return out


def win_old(first, count, win_cap):
    """The previous pack stage: 5-operand lax.sort."""
    big = jnp.iinfo(jnp.int32).max // 2 * 2
    w = first // SPAN_ALIGN
    off = lax.rem(first, SPAN_ALIGN)
    c1 = jnp.minimum(count, SPAN_ALIGN - off)
    c2 = count - c1
    live1 = count > 0
    live2 = c2 > 0
    key1 = jnp.where(live1, w, big)
    key2 = jnp.where(live2, w + 1, key1)
    end1 = off + c1
    words1 = tuple(
        jnp.where(live1, _lowmask(end1 - 32 * j) & ~_lowmask(off - 32 * j), 0)
        for j in range(4)
    )
    words2 = tuple(jnp.where(live2, _lowmask(c2 - 32 * j), 0) for j in range(4))
    r, k = first.shape
    def inter(a, b):
        return jnp.stack([a, b], axis=-1).reshape(r, -1)
    key = inter(key1, key2)
    m0, m1, m2, m3 = (inter(a, b) for a, b in zip(words1, words2))
    bnd = jnp.concatenate(
        [jnp.ones_like(key[:, :1], bool), key[:, 1:] != key[:, :-1]], axis=1)
    rank = jnp.cumsum(bnd.astype(_I32), axis=1) - 1
    child_rank = rank[:, 1::2]
    child_live = count > 0
    child_drop = child_live & (child_rank >= win_cap)
    kept_children = jnp.sum((child_live & ~child_drop).astype(_I32), axis=1)
    dropped = jnp.any(child_drop, axis=1)
    drop_pos = jnp.repeat(child_drop, 2, axis=1)
    m0, m1, m2, m3 = (jnp.where(drop_pos, 0, m) for m in (m0, m1, m2, m3))
    def comb(a, b):
        fa, fb = a[0], b[0]
        rest = tuple(jnp.where(fb, xb, xa | xb) for xa, xb in zip(a[1:], b[1:]))
        return (fa | fb,) + rest
    _, m0, m1, m2, m3 = lax.associative_scan(comb, (bnd, m0, m1, m2, m3), axis=1)
    last = jnp.concatenate(
        [key[:, :-1] != key[:, 1:], jnp.ones_like(key[:, :1], bool)], axis=1)
    keep = jnp.where(last & (key < big) & (rank < win_cap), key, big)
    keep, m0, m1, m2, m3 = lax.sort((keep, m0, m1, m2, m3), dimension=1,
                                    num_keys=1)
    keep, m0, m1, m2, m3 = (x[:, :win_cap] for x in (keep, m0, m1, m2, m3))
    live = keep < big
    win_first = jnp.where(live, keep * SPAN_ALIGN, 0)
    win_mask = jnp.stack([jnp.where(live, m, 0) for m in (m0, m1, m2, m3)], axis=1)
    return (win_first, win_mask, jnp.sum(live.astype(_I32), axis=1),
            kept_children, dropped)


CH = 256  # mirror the classify chunking (lax.map over row chunks)

def chunked(fn):
    def run(first, count):
        f = first.reshape(-1, CH, first.shape[1])
        c = count.reshape(-1, CH, count.shape[1])
        return lax.map(lambda ab: fn(ab[0], ab[1], WIN_CAP), (f, c))
    return run

o_new = timed("packed-key + gathers (new)", chunked(_window_masks), first, count)
o_old = timed("5-operand sort (old)", chunked(win_old), first, count)
for a, b in zip(o_new, o_old):
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
print("outputs identical", flush=True)
