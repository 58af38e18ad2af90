"""Benchmark harness: per-frame and per-phase timing.

Rebuilds the nbody_v5_bench measurement loop (nbody_v5_bench.cu:346-366):
cudaEvent timing around each simulationStep and a `Frame | ms | FPS` table
become wall-clock timing around a jitted step with block_until_ready.
Per-phase timing (the README's advertised 'octree construction / force
calculation / update' breakdown, README.md:56-60) comes from separately
jitted pipeline stages.
"""

from __future__ import annotations

import time
from typing import Callable, Dict, List, Optional

import jax
import jax.numpy as jnp

from nbody_tpu.config import SimConfig
from nbody_tpu.state import ParticleState


def _sync(x) -> None:
    """Force completion with a host readback.

    jax.block_until_ready is not a reliable barrier on every platform
    plugin (the tunnelled TPU relay acks before execution finishes);
    reading one element back to the host is.
    """
    leaf = jax.tree_util.tree_leaves(x)[0]
    _ = leaf.ravel()[0].item()


def time_fn(fn: Callable, *args, iters: int = 10, warmup: int = 2) -> Dict[str, float]:
    """Median/mean wall ms of fn(*args) with full device sync per call."""
    for _ in range(warmup):
        _sync(fn(*args))
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        _sync(fn(*args))
        times.append((time.perf_counter() - t0) * 1e3)
    times.sort()
    return {
        "median_ms": times[len(times) // 2],
        "mean_ms": sum(times) / len(times),
        "min_ms": times[0],
        "max_ms": times[-1],
    }


def frame_table(
    step_fn: Callable[[ParticleState], ParticleState],
    state: ParticleState,
    n_frames: int,
    print_every: int = 1,
    printer=print,
) -> List[Dict[str, float]]:
    """The reference bench loop: per-frame ms + FPS, one sync per frame
    (the analog of cudaEventSynchronize, nbody_v5_bench.cu:360)."""
    rows = []
    printer(f"{'Frame':<10} | {'Time (ms)':<15} | {'FPS':<10}")
    printer("-" * 42)
    for frame in range(n_frames):
        t0 = time.perf_counter()
        state = step_fn(state)
        _sync(state)
        ms = (time.perf_counter() - t0) * 1e3
        fps = 1000.0 / ms if ms > 0 else float("inf")
        rows.append({"frame": frame, "ms": ms, "fps": fps})
        if print_every and frame % print_every == 0:
            printer(f"{frame:<10} | {ms:<15.3f} | {fps:<10.1f}")
    return rows


def phase_times(
    state: ParticleState, cfg: SimConfig, iters: int = 10,
    include_tree: bool = False,
) -> Dict[str, float]:
    """Per-phase median ms: bbox+morton+sort / groups+bands / far / mid /
    near / integrate.  Phases are jitted separately, so totals will
    slightly exceed the fused step (which is the point of fusing).
    `include_tree` additionally times the reference-path octree build,
    which is NOT part of the production step."""
    from nbody_tpu.ops import forces, integrate as integ
    from nbody_tpu.ops.tree import build_tree
    from nbody_tpu.models.simulation import sort_by_morton

    pos, mass = state.pos, state.mass

    @jax.jit
    def ph_sort(pos):
        codes_s, perm, _, size = sort_by_morton(pos, cfg)
        return codes_s, perm, size

    codes_s, perm, size = jax.block_until_ready(ph_sort(pos))
    pos_s, mass_s = pos[perm], mass[perm]

    @jax.jit
    def ph_tree(codes_s, pos_s, mass_s, size):
        # the reference-path LinearTree is 30-bit; 63-bit keys nest
        if codes_s.ndim == 2:
            codes_s = (codes_s[:, 0] >> 1) & jnp.uint32(0x3FFFFFFF)
        return build_tree(codes_s, pos_s, mass_s, size)

    b = cfg.force_tile
    pos_p, mass_p, codes_p = forces.pad_sorted(pos_s, mass_s, codes_s, b)

    @jax.jit
    def ph_groups(pos_p, mass_p, codes_p):
        cells, supers, bands, tables = forces.build_bands(pos_p, mass_p, codes_p, cfg)
        return cells, supers, tables, bands

    cells, supers, mid_tab, bands = jax.block_until_ready(
        ph_groups(pos_p, mass_p, codes_p)
    )

    if cfg.use_pallas:
        from nbody_tpu.ops.pallas.forces import (
            far_sweep_pallas, table_sweep_pallas, near_span_pallas,
        )

        far_fn, mid_fn, near_fn = far_sweep_pallas, table_sweep_pallas, near_span_pallas
    else:
        far_fn = forces.far_sweep_jnp
        mid_fn = forces.table_sweep_jnp
        near_fn = lambda tp, sp, sm, wf, wm, wcnt, c: forces.near_correction_jnp(
            tp, sp, sm, wf, wm, c
        )

    @jax.jit
    def ph_far(pos_p, supers):
        return far_fn(pos_p, supers, cfg)

    @jax.jit
    def ph_mid(pos_p, mid_tab):
        return mid_fn(pos_p, mid_tab, cfg)

    @jax.jit
    def ph_near(pos_p, mass_p, win_first, win_mask, win_cnt):
        return near_fn(pos_p, pos_p, mass_p, win_first, win_mask, win_cnt, cfg)

    acc_s = jax.block_until_ready(
        ph_far(pos_p, supers) + ph_mid(pos_p, mid_tab)
        + ph_near(pos_p, mass_p, bands.win_first, bands.win_mask, bands.win_cnt)
    )[: pos.shape[0]]

    @jax.jit
    def ph_integrate(state, acc):
        return integ.integrate(state, acc, cfg)

    out = {
        "sort_ms": time_fn(ph_sort, pos, iters=iters)["median_ms"],
        "groups_ms": time_fn(ph_groups, pos_p, mass_p, codes_p, iters=iters)["median_ms"],
        "far_ms": time_fn(ph_far, pos_p, supers, iters=iters)["median_ms"],
        "mid_ms": time_fn(ph_mid, pos_p, mid_tab, iters=iters)["median_ms"],
        "near_ms": time_fn(ph_near, pos_p, mass_p, bands.win_first, bands.win_mask, bands.win_cnt, iters=iters)["median_ms"],
        "integrate_ms": time_fn(ph_integrate, state, acc_s, iters=iters)["median_ms"],
    }
    if include_tree:
        out["tree_ms"] = time_fn(
            ph_tree, codes_s, pos_s, mass_s, size, iters=iters
        )["median_ms"]
    return out


def trace(log_dir: str):
    """Context manager around jax.profiler.trace — the TPU equivalent of
    nvprof/NVTX the reference never had (SURVEY.md §5).  View with
    TensorBoard or xprof."""
    return jax.profiler.trace(log_dir)


def transfer_bench(n_bytes: int = 1 << 26, iters: int = 5) -> Dict[str, float]:
    """Host<->device transfer bandwidth — the 'CPU-GPU memory transfer
    benchmarks' the reference README advertises (README.md:27) but its
    source never implemented (SURVEY.md §2.4 #6)."""
    import numpy as np

    x = np.ones(n_bytes // 4, np.float32)
    d = jax.device_put(x)
    _sync(d)
    t0 = time.perf_counter()
    for _ in range(iters):
        d = jax.device_put(x)
        _sync(d)
    h2d = n_bytes * iters / (time.perf_counter() - t0)
    t0 = time.perf_counter()
    for _ in range(iters):
        _ = np.asarray(d)
    d2h = n_bytes * iters / (time.perf_counter() - t0)
    return {"h2d_gbps": h2d / 1e9, "d2h_gbps": d2h / 1e9, "mb": n_bytes / 1e6}
