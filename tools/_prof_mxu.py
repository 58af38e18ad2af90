"""Micro-benchmark: VPU-reduction panel vs MXU-offload panel.

Current panel math per (B, LC) chunk: 3 multiplies (w*dx etc.) + 3
cross-lane sum reductions on the VPU.  Candidate: one small MXU matmul
S = w @ [1|qx|qy|qz]^T  (B,4), then ax = S[:,1] - px*S[:,0] — the MXU is
otherwise idle in this workload, and the identity
sum w*(qx-px) = sum w*qx - px * sum w moves 6 VPU ops/pair off the VPU.
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import sys, functools, time
import jax, jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B = 256
LC = 1024
SOFT = 50.0

def _panel_vpu(p, qx, qy, qz, qm):
    dx = qx - p[:, 0:1]
    dy = qy - p[:, 1:2]
    dz = qz - p[:, 2:3]
    d2 = dx * dx + dy * dy + dz * dz
    inv = lax.rsqrt(d2 + SOFT)
    w = qm * (inv * inv * inv)
    ax = jnp.sum(w * dx, axis=1, keepdims=True)
    ay = jnp.sum(w * dy, axis=1, keepdims=True)
    az = jnp.sum(w * dz, axis=1, keepdims=True)
    return jnp.concatenate([ax, ay, az], axis=1)

def _panel_mxu(p, qx, qy, qz, qm):
    dx = qx - p[:, 0:1]
    dy = qy - p[:, 1:2]
    dz = qz - p[:, 2:3]
    d2 = dx * dx + dy * dy + dz * dz
    inv = lax.rsqrt(d2 + SOFT)
    w = qm * (inv * inv * inv)                       # (B, LC)
    m = jnp.concatenate([jnp.ones_like(qx), qx, qy, qz], axis=0)  # (4, LC)
    s = lax.dot_general(w, m, (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32)        # (B, 4)
    return s[:, 1:4] - p[:, 0:3] * s[:, 0:1]

def _panel_mxu_c(p, qx, qy, qz, qm):
    # block-centered variant: subtract the target block's mean coordinate
    # from both sides so the sum-identity cancellation happens at the
    # distance scale, not the global coordinate scale
    c = jnp.mean(p, axis=0, keepdims=True)           # (1, 3)
    pc = p - c
    qxc, qyc, qzc = qx - c[0, 0], qy - c[0, 1], qz - c[0, 2]
    dx = qxc - pc[:, 0:1]
    dy = qyc - pc[:, 1:2]
    dz = qzc - pc[:, 2:3]
    d2 = dx * dx + dy * dy + dz * dz
    inv = lax.rsqrt(d2 + SOFT)
    w = qm * (inv * inv * inv)
    m = jnp.concatenate([jnp.ones_like(qx), qxc, qyc, qzc], axis=0)
    s = lax.dot_general(w, m, (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32)
    return s[:, 1:4] - pc[:, 0:3] * s[:, 0:1]

def make_kernel(panel):
    def _k(pos_ref, x_ref, y_ref, z_ref, gm_ref, acc_ref):
        j = pl.program_id(1)
        @pl.when(j == 0)
        def _init():
            acc_ref[0] = jnp.zeros_like(acc_ref[0])
        part = panel(pos_ref[0], x_ref[:].reshape(1, LC), y_ref[:].reshape(1, LC),
                     z_ref[:].reshape(1, LC), gm_ref[:].reshape(1, LC))
        acc_ref[0] = acc_ref[0] + part
    return _k

def sweep(panel, pos3, gx, gy, gz, gm):
    t = pos3.shape[0]
    n_chunks = gx.shape[0] // LC
    row = pl.BlockSpec((LC,), lambda i, j: (j,), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        make_kernel(panel),
        grid=(t, n_chunks),
        in_specs=[pl.BlockSpec((1, B, 3), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
                  row, row, row, row],
        out_specs=pl.BlockSpec((1, B, 3), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((t, B, 3), jnp.float32),
    )(pos3, gx, gy, gz, gm)

def main():
    n = 1 << 20
    g = 8192   # sources => n * g = 8.6e9 pairs
    key = jax.random.PRNGKey(0)
    pos3 = jax.random.uniform(key, (n // B, B, 3), jnp.float32, -1700, 1700)
    gx, gy, gz = [jax.random.uniform(jax.random.PRNGKey(i), (g,), jnp.float32, -1700, 1700)
                  for i in range(3)]
    gm = jax.random.uniform(jax.random.PRNGKey(9), (g,), jnp.float32, 1, 7)

    from nbody_tpu.utils.profiling import _sync, time_fn
    pairs = n * g
    outs = {}
    for name, panel in [("vpu", _panel_vpu), ("mxu", _panel_mxu),
                        ("mxu_c", _panel_mxu_c)]:
        f = jax.jit(functools.partial(sweep, panel))
        a = f(pos3, gx, gy, gz, gm); _sync(a)
        outs[name] = np.asarray(a)
        t = time_fn(f, pos3, gx, gy, gz, gm, iters=8, warmup=2)
        ms = t["median_ms"] - 32.0   # relay overhead
        print(f"{name}: {t['median_ms']:.1f} ms raw, ~{ms:.1f} ms net "
              f"-> {pairs/ms*1e3/1e9:.0f} G pairs/s", flush=True)
    ra = outs["vpu"]
    for name in ("mxu", "mxu_c"):
        rb = outs[name]
        rel = np.max(np.linalg.norm(ra - rb, axis=-1)
                     / (np.linalg.norm(ra, axis=-1) + 1e-6))
        print(f"max rel diff vpu-vs-{name}: {rel:.2e}")

if __name__ == "__main__":
    main()
