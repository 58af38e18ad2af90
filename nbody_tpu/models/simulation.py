"""Per-step simulation pipelines.

`step_barnes_hut` is the TPU rebuild of the reference's simulationStep()
(nbody_v5.cu:298-325): bbox -> Morton -> sort -> tree build -> COM ->
force -> integrate, as ONE jitted function.  Where the CUDA version
crosses the host boundary every step (~489 batched insert launches, a
nodeCounter D2H readback, thrust's internal syncs — SURVEY.md §3 boundary
summary), this is a single XLA program with zero host round-trips.

`step_direct` is the O(N^2) pipeline of the nbody_simple generation — the
permanent correctness oracle.

Both keep particles in their ORIGINAL order across steps (the Morton
permutation is internal to a step), so particle identities are stable for
dumps, golden comparisons, and checkpoints — the reference does the same
by sorting an index array rather than the particle arrays
(nbody_v5.cu:302-306).
"""

from __future__ import annotations

import functools
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp

from nbody_tpu.config import SimConfig
from nbody_tpu.state import ParticleState
from nbody_tpu.ops import bbox, morton, forces, integrate as integ
from nbody_tpu.ops.tree import build_tree, LinearTree


def compute_bh_acc(
    pos: jax.Array, mass: jax.Array, cfg: SimConfig, force_fn: str = "tiled"
) -> jax.Array:
    """Barnes-Hut accelerations in the particles' original order.

    force_fn: "tiled" (production, optionally Pallas) | "reference"
    (per-particle walk) — both over the same functionally built tree.
    """
    n = pos.shape[0]
    lo, size = bbox.bounding_cube(pos)
    if cfg.morton_bits == 63:
        # legacy (nbody/nbody_bh) key width: 63-bit codes as (hi, lo)
        # uint32 pairs sorted lexicographically (cub::DeviceRadixSort on
        # u64 keys in nbody_bh.exe).  The 30-bit codes the cell build
        # needs are the TOP 30 BITS of the 63-bit keys (bits 33..62 =
        # hi >> 1): a strict prefix of the sort key, so the sorted order
        # of the 63-bit keys is also sorted for them.  (Re-encoding at
        # 10-bit quantization would NOT nest — the lattices differ.)
        hi, lo32 = morton.encode63(pos, lo, size)
        shi, _, perm = morton.morton_sort_63(hi, lo32)
        codes_s = (shi >> 1) & jnp.uint32(0x3FFFFFFF)
    else:
        codes = morton.encode30(pos, lo, size)
        codes_s, perm = morton.morton_sort_30(codes)
    pos_s = pos[perm]
    mass_s = mass[perm]
    if force_fn == "tiled":
        # production: hierarchical dense band decomposition over adaptive
        # octree source cells — no explicit tree on the hot path (see
        # ops/forces.py and ops/cells.py)
        pos_p, mass_p, codes_p = forces.pad_sorted(
            pos_s, mass_s, codes_s, cfg.force_tile
        )
        acc_s = forces.bh_forces_grouped(pos_p, mass_p, codes_p, cfg)[:n]
    elif force_fn == "reference":
        tree = build_tree(codes_s, pos_s, mass_s, size)
        acc_s = forces.bh_forces_reference(pos_s, tree, cfg)
    else:
        raise ValueError(f"unknown force_fn {force_fn}")
    # Scatter back to original order (inverse of the Morton permutation).
    return jnp.zeros_like(acc_s).at[perm].set(acc_s)


def step_barnes_hut(state: ParticleState, cfg: SimConfig, force_fn: str = "tiled") -> ParticleState:
    acc = compute_bh_acc(state.pos, state.mass, cfg, force_fn)
    return integ.integrate(state, acc, cfg)


def step_direct(state: ParticleState, cfg: SimConfig) -> ParticleState:
    acc = forces.direct_forces(state.pos, state.mass, cfg)
    return integ.integrate(state, acc, cfg)


class Simulation:
    """User-facing driver: owns a config, a jitted step, and the state.

    The reference exposes exactly one entry point per program generation
    (`simulationStep()` + a main loop); this class covers all of them via
    `method`:
      * "barnes_hut"          — v5 pipeline, tiled/Pallas forces
      * "barnes_hut_reference"— v5 pipeline, per-particle walk
      * "direct"              — nbody_simple O(N^2) pipeline
    """

    def __init__(self, cfg: SimConfig, method: str = "barnes_hut"):
        self.cfg = cfg
        self.method = method
        if method == "direct":
            fn = functools.partial(step_direct, cfg=cfg)
        elif method == "barnes_hut":
            fn = functools.partial(step_barnes_hut, cfg=cfg, force_fn="tiled")
        elif method == "barnes_hut_reference":
            fn = functools.partial(step_barnes_hut, cfg=cfg, force_fn="reference")
        else:
            raise ValueError(f"unknown method {method}")
        self._step = jax.jit(fn)
        self._multi_cache = {}

    def init_state(self) -> ParticleState:
        from nbody_tpu.init import make_initial_state

        return make_initial_state(self.cfg)

    def step(self, state: ParticleState) -> ParticleState:
        return self._step(state)

    def run(
        self,
        state: ParticleState,
        n_steps: int,
        callback: Optional[Callable[[int, ParticleState], None]] = None,
        callback_every: int = 0,
    ) -> ParticleState:
        """Advance n_steps; optional host callback every `callback_every`
        steps (forces a device sync — use sparingly, like the reference's
        per-frame cudaEventSynchronize, nbody_v5_bench.cu:360).

        Steps between callbacks run inside compiled lax.scan chunks, so
        there is no per-step dispatch overhead (the reference necessarily
        pays ~500 kernel launches per step from the host).
        """
        chunk = callback_every if (callback is not None and callback_every) else n_steps
        done = 0
        while done < n_steps:
            k = min(chunk, n_steps - done)
            state = self._multi(k)(state)
            done += k
            if callback is not None and callback_every:
                # host readback, not block_until_ready: the tunnelled TPU
                # relay acks before execution finishes (see profiling._sync)
                from nbody_tpu.utils.profiling import _sync

                _sync(state)
                callback(done, state)
        return state

    def _multi(self, k: int):
        """Cached jitted k-step scan."""
        if k not in self._multi_cache:
            if self.method == "direct":
                body = lambda s, _: (step_direct(s, self.cfg), None)
            elif self.method == "barnes_hut":
                body = lambda s, _: (step_barnes_hut(s, self.cfg, "tiled"), None)
            else:
                body = lambda s, _: (step_barnes_hut(s, self.cfg, "reference"), None)

            @jax.jit
            def multi(s):
                out, _ = jax.lax.scan(body, s, None, length=k)
                return out

            self._multi_cache[k] = multi
        return self._multi_cache[k]

    def run_scan(self, state: ParticleState, n_steps: int) -> ParticleState:
        """Advance n_steps inside a single compiled lax.scan — no per-step
        dispatch at all (the reference necessarily re-launches ~500 kernels
        per step from the host)."""
        return self._multi(n_steps)(state)
