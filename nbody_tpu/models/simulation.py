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


def sort_by_morton(pos: jax.Array, cfg: SimConfig):
    """Morton-sort honoring cfg.morton_bits: (codes_sorted, perm, lo,
    size).

    With morton_bits=63 (the production default; also the legacy
    nbody/nbody_bh key width — cub::DeviceRadixSort on u64 keys in
    nbody_bh.exe), codes are (hi, lo) uint32 pairs sorted
    lexicographically and returned STACKED as [N, 2]: the cell build
    consumes the full 63 bits for a 21-level adaptive cut (the 30-bit
    lattice floors cell width at box/1024, degenerating a contracted
    core to unbounded exact P2P — ops/cells.py).  With morton_bits=30
    (v5 sort-key parity, nbody_v5.cu:57-78) codes are plain uint32 [N]
    and the cut is 10 levels.  Shared by the single-step path and every
    band-reuse runner, so the key width is honored everywhere.
    """
    lo, size = bbox.bounding_cube(pos)
    if cfg.morton_bits == 63:
        hi, lo32 = morton.encode63(pos, lo, size)
        shi, slo, perm = morton.morton_sort_63(hi, lo32)
        codes_s = jnp.stack([shi, slo], axis=1)
    else:
        codes = morton.encode30(pos, lo, size)
        codes_s, perm = morton.morton_sort_30(codes)
    return codes_s, perm, lo, size


def compute_bh_acc(
    pos: jax.Array, mass: jax.Array, cfg: SimConfig, force_fn: str = "tiled"
) -> jax.Array:
    """Barnes-Hut accelerations in the particles' original order.

    force_fn: "tiled" (production, optionally Pallas) | "reference"
    (per-particle walk) — both over the same functionally built tree.
    """
    n = pos.shape[0]
    codes_s, perm, lo, size = sort_by_morton(pos, cfg)
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
        # the explicit LinearTree is 30-bit; 63-bit sort keys nest to
        # their top 30 bits (hi >> 1 = bits 33..62, a strict key prefix),
        # so the sorted order remains valid for the truncated codes
        if codes_s.ndim == 2:
            codes30 = (codes_s[:, 0] >> 1) & jnp.uint32(0x3FFFFFFF)
        else:
            codes30 = codes_s
        tree = build_tree(codes30, pos_s, mass_s, size)
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


# ---------------------------------------------------------------------------
# Multi-step band reuse ("skin" cycles)
#
# Rebuilding sort + cells + classification + tables every step costs ~1/3
# of a 1M step but the structure barely changes between steps.  A CYCLE
# rebuilds once with every MAC inflated by a skin margin, then reuses the
# frozen structure for K steps:
#   * the particle ORDER is frozen (no re-sort): cells/spans stay valid as
#     index ranges by construction;
#   * the SOURCE representation (super/cell/child/grandchild monopoles,
#     tables, span lists) is frozen: stale by at most the per-cycle drift
#     bound, which the skin absorbs — every approximated region still
#     satisfies width/dist < theta against live positions;
#   * TARGET positions are live: the far/mid sweeps re-evaluate against
#     live targets each step, and the exact near band is live on both
#     sides (spans index the frozen order, positions are current).
# The drift bound is sum_{j=1..K} (vmax + j*amax*dt)*dt from the rebuild's
# measured max speed/acceleration, times cfg.skin_safety (capped by
# MAX_SPEED*DT*K when speed clamping is on, nbody_v5.cu:262-269).
# ---------------------------------------------------------------------------


def _pad_cycle_state(state: ParticleState, b: int):
    """Pad to a force_tile multiple with massless clones of the last
    particle (clone velocity too, so pads track the cloud); `orig` maps
    each padded row to its original index (pads -> n, dropped on scatter).
    """
    n = state.pos.shape[0]
    n_pad = -(-n // b) * b
    pad = n_pad - n
    orig = jnp.concatenate(
        [jnp.arange(n, dtype=jnp.int32), jnp.full((pad,), n, jnp.int32)]
    )
    if pad == 0:
        return state.pos, state.vel, state.mass, state.acc, orig
    pos = jnp.concatenate([state.pos, jnp.broadcast_to(state.pos[-1], (pad, 3))])
    vel = jnp.concatenate([state.vel, jnp.broadcast_to(state.vel[-1], (pad, 3))])
    mass = jnp.concatenate([state.mass, jnp.zeros((pad,), state.mass.dtype)])
    acc = jnp.concatenate([state.acc, jnp.zeros((pad, 3), state.acc.dtype)])
    return pos, vel, mass, acc, orig


def make_cycle_runner(cfg: SimConfig, n_cycles: int, k: int):
    """A jittable function advancing a state by n_cycles * k steps with
    one band rebuild per cycle.

    With cfg.hold_farmid = R > 1 the smooth far+mid monopole bands are
    additionally HELD for R steps at a time (r-RESPA-style force
    splitting): each sub-cycle evaluates far+mid once against its start
    positions, and the R steps inside re-evaluate only the exact near
    band (live on both sides).  The far field is theta-approximate and
    smooth, so its R-step staleness error is far below the MAC truncation
    error; validity of the frozen classification is already guaranteed by
    the same skin margins that cover K steps of drift.  Energy-drift
    impact is measured in bench.py (BASELINE.json physics criterion)."""

    r = max(1, cfg.hold_farmid)
    if k % r:
        r = 1  # hold must divide the cycle; fall back to per-step far+mid

    def cycle(carry, _):
        pos, vel, mass, acc, orig = carry
        codes_s, perm, _, _ = sort_by_morton(pos, cfg)
        pos, vel, mass, acc, orig = (
            pos[perm], vel[perm], mass[perm], acc[perm], orig[perm]
        )
        # conservative PER-PARTICLE drift bound over the cycle (a single
        # extreme particle no longer widens every band: cells, children,
        # supers, and target sub-spheres each carry their own local max)
        v = jnp.sqrt(jnp.sum(vel * vel, axis=1))
        a = jnp.sqrt(jnp.sum(acc * acc, axis=1))
        drift = drift_bound(v, a, cfg, k)
        _, supers, bands, tables = forces.build_bands(
            pos, mass, codes_s, cfg, drift=drift
        )

        def subcycle(c2, _):
            p0, v0, a0 = c2
            # held far+mid sampling positions per cfg.hold_predict (the
            # kilostep gate measured midpoint PREDICTION actively harmful
            # in the contracted core — config.py rationale)
            tau = 0.5 * (r - 1) * cfg.dt
            p_mid = hold_predict_pos(p0, v0, a0, tau, cfg)
            afm = forces.apply_farmid(p_mid, supers, tables, cfg)

            def inner(c3, _):
                p, v, _ = c3
                a = afm + forces.apply_near(p, p, mass, bands, cfg)
                st = integ.integrate(
                    ParticleState(pos=p, vel=v, mass=mass, acc=a), a, cfg
                )
                return (st.pos, st.vel, a), None

            return jax.lax.scan(inner, (p0, v0, a0), None, length=r)

        if r == 1:
            def inner1(c2, _):
                p, v, _ = c2
                a = forces.apply_bands(p, mass, supers, bands, tables, cfg)
                st = integ.integrate(
                    ParticleState(pos=p, vel=v, mass=mass, acc=a), a, cfg
                )
                return (st.pos, st.vel, a), None

            (pos, vel, acc), _ = jax.lax.scan(
                inner1, (pos, vel, acc), None, length=k
            )
        else:
            (pos, vel, acc), _ = jax.lax.scan(
                subcycle, (pos, vel, acc), None, length=k // r
            )
        return (pos, vel, mass, acc, orig), None

    def run(state: ParticleState) -> ParticleState:
        n = state.pos.shape[0]
        carry = _pad_cycle_state(state, cfg.force_tile)
        carry, _ = jax.lax.scan(cycle, carry, None, length=n_cycles)
        pos, vel, mass, acc, orig = carry
        # scatter back to original order (pad rows' orig == n: dropped)
        return ParticleState(
            pos=jnp.zeros((n, 3), pos.dtype).at[orig].set(pos),
            vel=jnp.zeros((n, 3), vel.dtype).at[orig].set(vel),
            mass=state.mass,
            acc=jnp.zeros((n, 3), acc.dtype).at[orig].set(acc),
        )

    return run


def drift_bound(v: jax.Array, a: jax.Array, cfg: SimConfig, k: int) -> jax.Array:
    """Conservative per-particle travel bound over k steps (speed v,
    acceleration a magnitudes), scaled by cfg.skin_safety and capped by
    the MAX_SPEED clamp when active (nbody_v5.cu:262-269).  Shared by the
    fixed-K cycle runner, the adaptive runner, and the sharded runners so
    their skin semantics stay in lockstep."""
    drift = (
        v * cfg.dt * k + 0.5 * a * cfg.dt * cfg.dt * k * (k + 1)
    ) * cfg.skin_safety
    if cfg.clamp_speed:
        drift = jnp.minimum(drift, cfg.max_speed * cfg.dt * k)
    return drift


_HORIZON_HEADROOM = 1.1


def adaptive_drift(v, a, codes_s, box_size, cfg: SimConfig, k=None):
    """Width-capped per-particle skin envelopes (the adaptive runner's
    scheme): min(k-step travel bound, skin_width_cap * local Morton cell
    width).  Keeps fast-core skins from flooding the band caps.

    `k` (traced ok) sizes the travel part; the adaptive runner passes its
    SELF-TUNED envelope horizon (~2x the last validity horizon) instead
    of the static cfg.rebuild_every: envelopes sized for 16 steps when
    the hot state only ever achieves 1-2 inflate every MAC for nothing —
    measured at the 1M hot state as ~10x the live band demand."""
    if k is None:
        k = cfg.rebuild_every
    drift_k = drift_bound(v, a, cfg, k)
    w_loc = forces.local_width(codes_s, box_size, cfg.force_tile)
    # floor the CAP (not the cells) at the 30-bit lattice width box/1024:
    # 63-bit codes resolve run widths far below it, and letting one dense
    # 32-run cap its members' envelopes at ~0 pins the GLOBAL-min validity
    # horizon at 1 — per-step rebuilds everywhere (measured: 322 ms/step
    # at the 1M IC vs 88 with the floor).  Skins keep exactly the round-2
    # 30-bit semantics; only the cell/near-band geometry goes deeper.
    w_loc = jnp.maximum(w_loc, box_size * cfg.skin_width_floor)
    return jnp.minimum(drift_k, cfg.skin_width_cap * w_loc)


def validity_horizon(v, a, drift, cfg: SimConfig) -> jax.Array:
    """The largest step count s such that no particle's bounded travel
    (v s dt + 1/2 a (s dt)^2, with headroom) exceeds its skin envelope;
    the frozen band structure is exactly valid for s steps.

    cfg.horizon_floor > 1 raises the lower clip: the fastest tail may
    then run past its envelope for up to floor-1 steps — a bounded LOCAL
    theta violation (config.py rationale; kilostep-gated)."""
    head = _HORIZON_HEADROOM
    aq = 0.5 * a * cfg.dt * cfg.dt * head
    bq = jnp.maximum(v * cfg.dt * head, 1e-9)
    s_lin = drift / bq
    s_quad = (jnp.sqrt(bq * bq + 4.0 * aq * drift) - bq) / jnp.maximum(
        2.0 * aq, 1e-12
    )
    s_i = jnp.where(aq > 1e-9, s_quad, s_lin)
    lo = max(1, min(cfg.horizon_floor, cfg.rebuild_every))
    return jnp.clip(
        jnp.floor(jnp.min(s_i)).astype(jnp.int32), lo, cfg.rebuild_every
    )


# Largest padded N for which the nested runner's inner loop may carry its
# vector fields as [N, 3]: XLA tiles f32[N, 3] at (8, 128), so 4 carried
# fields cost 4 * 128 lanes * 4 B = 2 KB/particle of HBM (2 GB at 1M).
# Past this, the inner loop carries flat [3N] and pays the measured
# ~8 ms/step (at 1M) of per-step reshape materialization instead.
_INNER3_MAX_NPAD = 2_097_152


def _flat(x3: jax.Array) -> jax.Array:
    return x3.reshape(-1)


def _v3(xf: jax.Array) -> jax.Array:
    return xf.reshape(-1, 3)


def hold_predict_pos(pos, vel, acc, tau, cfg: SimConfig):
    """Target sampling positions for a held far+mid refresh
    (cfg.hold_predict): current positions (0, first-order hold),
    ballistic midpoint (1), or quadratic midpoint (2).  Measured at the
    shipped span config (1M kilostep): 0 is the only policy that does
    not PUMP energy in the contracted core — the local field rotates
    faster than any per-particle extrapolation, so midpoint prediction
    (1.24% ballistic / 1.47% quadratic vs 0.72% first-order) amplifies
    the staleness error it was meant to center away.  Works on [N,3] or
    flat [3N] layouts (elementwise).  `tau` may be traced."""
    if cfg.hold_predict == 0:
        return pos
    p = pos + vel * tau
    if cfg.hold_predict >= 2:
        p = p + acc * (0.5 * tau * tau)
    return p


def _adaptive_rebuild_fn(cfg: SimConfig):
    """One adaptive band rebuild as a reusable closure: Morton re-sort,
    packed permutation, self-tuned skin envelopes, band build, validity
    horizon + envelope feedback.  Shared by the nested one-shot runner
    (make_adaptive_runner) and the flat persistent-stepper parts
    (_adaptive_parts).

    MEMORY LAYOUT: the [N, 3] vector fields (pos, vel, acc, afm) travel
    FLAT as [3N].  XLA's TPU tiling pads an f32[N, 3] temp's minor dim
    3 -> 128 lanes (42.7x: 46 MB logical -> 1.9 GB at N=4M), and a
    while-loop carry plus five per-field permutation gathers materialize
    several such temps at once — the measured single-chip 4M OOM (16.45G
    > 15.75G HBM, 43.7% fragmentation).  1D carries are linear (never
    padded) and alias across loop iterations; [N, 3] views materialize
    only transiently where an op needs them (Pallas operands, gathers).
    """

    def norms(x):
        return jnp.sqrt(jnp.sum(x * x, axis=1))

    def rebuild(posf, velf, mass, accf, orig, k_env, afmf=None):
        pos = _v3(posf)
        codes_s, perm, box_lo, size = sort_by_morton(pos, cfg)
        # ONE packed row-gather applies the Morton permutation to every
        # per-particle field: row gathers cost ~4.4 ns/row regardless of
        # width <= 128 (PERF.md) vs ~32 ns/particle for the five separate
        # gathers this replaces, and it materializes one padded temp
        # instead of five (int32 orig rides along bitcast to f32 — a
        # gather moves bits, never arithmetic).  When the held far+mid
        # acceleration SPANS rebuilds (cfg.farmid_span_rebuilds), it
        # rides the same gather as three more lanes.
        cols = [pos, _v3(velf), _v3(accf), mass[:, None],
                jax.lax.bitcast_convert_type(orig, jnp.float32)[:, None]]
        if afmf is not None:
            cols.append(_v3(afmf))
        packed = jnp.concatenate(cols, axis=1)           # [Np, 11|14]
        g = packed[perm]
        pos, vel, acc = g[:, 0:3], g[:, 3:6], g[:, 6:9]
        mass = g[:, 9]
        orig = jax.lax.bitcast_convert_type(g[:, 10], jnp.int32)
        afm_out = None if afmf is None else _flat(g[:, 11:14])
        v = norms(vel)
        a = norms(acc)
        # SELF-TUNED envelope horizon: skins sized for the reuse actually
        # being achieved (~2x the last validity horizon, so calm epochs
        # re-grow to the full K in a few rebuilds) instead of always K —
        # a 16-step envelope inflates every MAC ~10x at the 1M hot state
        # whose horizon is 1-2 steps (tools/_prof_capdemand.py)
        drift = adaptive_drift(v, a, codes_s, size, cfg,
                               k=k_env.astype(jnp.float32))
        _, supers, bands, tables = forces.build_bands(
            pos, mass, codes_s, cfg, drift=drift
        )
        # VALIDITY HORIZON computed ONCE here, so the steps in between
        # carry only scalar checks (no per-step [N] reductions or
        # array-level triggers)
        s_valid = validity_horizon(v, a, drift, cfg)
        # ENVELOPE FEEDBACK: if this build's skins pushed any band past
        # its cap (graceful, but a standing theta violation for the
        # overflowed pairs), halve the next envelope horizon instead of
        # growing it — reuse length self-tunes to the largest skin the
        # caps can absorb.  Caps are sized so live demand always fits
        # (config.py), so k_next=1 (skinless) never overflows.
        overflowed = (bands.ss_overflow | bands.sup_overflow
                      | bands.mid_overflow | bands.cmid_overflow
                      | bands.near_overflow)
        k_next = jnp.where(
            overflowed,
            jnp.maximum(k_env // 2, 1),
            jnp.clip(2 * s_valid, 1, cfg.rebuild_every),
        )
        # refresh context: what forces.refresh_farmid needs to recompute
        # moments at this build's frozen cut (codes/skins/quantization box)
        rctx = (codes_s, drift, box_lo, size)
        built = (_flat(pos), _flat(vel), mass, _flat(acc), orig,
                 supers, bands, tables, rctx)
        if afmf is not None:
            return built, (s_valid, k_next), afm_out
        return built, (s_valid, k_next)

    return rebuild


def _adaptive_parts(cfg: SimConfig):
    """The FLAT adaptive-runner building blocks used by the persistent
    stepper (AdaptiveStepper): (init_carry, body, extract).

    The carry is (i, left, afm_age, n_rb, k_env, afm, pos, vel, mass,
    acc, orig, supers, bands, tables) — everything a step needs, so it
    can live on device across host calls.  Carrying the band pytree
    costs real per-step traffic (the cond/carry overhead the nested
    make_adaptive_runner avoids), which is the right trade ONLY for the
    interactive stepper, whose band state must survive host-call
    boundaries."""
    r = max(1, cfg.hold_farmid)
    span = cfg.farmid_span_rebuilds
    span_dyn = span and cfg.span_age_mult > 0
    rebuild = _adaptive_rebuild_fn(cfg)

    def _r_eff_of(s_valid):
        return jnp.clip(cfg.span_age_mult * s_valid, 1, r).astype(jnp.int32)

    def init_carry(state: ParticleState):
        pos, vel, mass, acc, orig = _pad_cycle_state(state, cfg.force_tile)
        built, (s_valid, k_env) = rebuild(
            _flat(pos), _flat(vel), mass, _flat(acc), orig,
            jnp.int32(cfg.rebuild_every)
        )
        r0 = max(1, cfg.hold_farmid)
        if span_dyn:
            tau0 = 0.5 * (_r_eff_of(s_valid).astype(jnp.float32)
                          - 1.0) * cfg.dt
        else:
            tau0 = 0.5 * (r0 - 1) * cfg.dt
        afm0 = forces.apply_farmid(
            _v3(hold_predict_pos(built[0], built[1], built[3], tau0, cfg)),
            built[5], built[7], cfg,
        )
        carry = (jnp.int32(0), s_valid, jnp.int32(0), jnp.int32(1),
                 k_env, _flat(afm0)) + built
        if span_dyn:
            carry = carry + (_r_eff_of(s_valid),)
        return carry

    def body(s):
        i, left, afm_age, n_rb, k_env, afmf = s[:6]
        (posf, velf, mass, accf, orig, supers, bands, tables,
         rctx) = s[6:15]
        r_eff = s[15] if span_dyn else jnp.int32(r)

        trig = left <= 0
        if span:
            # the held far+mid SPANS rebuilds: it rides the rebuild's
            # packed permutation gather, so only AGE refreshes it
            (posf, velf, mass, accf, orig, supers, bands, tables,
             rctx), (s_new, k_new), afmf = jax.lax.cond(
                trig,
                lambda c: rebuild(*c[:5], c[9], c[10]),
                lambda c: (c[:9], (jnp.int32(0), c[9]), c[10]),
                (posf, velf, mass, accf, orig, supers, bands, tables,
                 rctx, k_env, afmf),
            )
            if span_dyn:
                # horizon-tied hold limit, recomputed per rebuild
                r_eff = jnp.where(trig, _r_eff_of(s_new), r_eff)
            refresh = afm_age >= r_eff
        else:
            (posf, velf, mass, accf, orig, supers, bands, tables,
             rctx), (s_new, k_new) = jax.lax.cond(
                trig,
                lambda c: rebuild(*c[:5], c[9]),
                lambda c: (c[:9], (jnp.int32(0), c[9])),
                (posf, velf, mass, accf, orig, supers, bands, tables,
                 rctx, k_env),
            )
            # refresh the held far+mid on rebuild or every R steps; with
            # cfg.refresh_moments an AGE refresh also recomputes every
            # source moment from live positions at the frozen cut (a
            # rebuild's own tables are already live-exact, so the trig
            # branch keeps them)
            refresh = trig | (afm_age >= r)
        left = jnp.where(trig, s_new, left)
        k_env = k_new
        pos = _v3(posf)
        # held-refresh target sampling per cfg.hold_predict (shipping: the
        # CURRENT positions — prediction measured harmful, config.py);
        # moment refreshes keep LIVE source positions
        if span_dyn:
            tau = 0.5 * (r_eff.astype(jnp.float32) - 1.0) * cfg.dt
        else:
            tau = 0.5 * (r - 1) * cfg.dt
        pmidf = hold_predict_pos(posf, velf, accf, tau, cfg)
        frozen_fm = lambda args: _flat(
            forces.apply_farmid(_v3(args[0]), args[1], args[2], cfg)
        )
        ops = (pmidf, supers, tables, mass) + rctx + (bands, posf)
        if cfg.refresh_moments:
            moments_fm = lambda a: _flat(forces.refresh_farmid(
                _v3(a[9]), a[3], a[4], a[5], a[6], a[7], a[8], cfg,
                tgt_pos=_v3(a[0]),
            ))
            branch = jnp.where(
                refresh, jnp.where(trig, 1, 2), 0
            ).astype(jnp.int32)
            afmf = jax.lax.switch(
                branch, [lambda a: afmf, frozen_fm, moments_fm], ops
            )
        else:
            afmf = jax.lax.cond(refresh, frozen_fm, lambda a: afmf, ops)
        afm_age = jnp.where(refresh, 1, afm_age + 1)

        a = _v3(afmf) + forces.apply_near(pos, pos, mass, bands, cfg)
        st = integ.integrate(
            ParticleState(pos=pos, vel=_v3(velf), mass=mass, acc=a), a, cfg
        )
        out = (i + 1, left - 1, afm_age, n_rb + trig.astype(jnp.int32),
               k_env, afmf, _flat(st.pos), _flat(st.vel), mass,
               _flat(a), orig, supers, bands, tables, rctx)
        if span_dyn:
            out = out + (r_eff,)
        return out

    def extract(carry, n: int, mass0: jax.Array) -> ParticleState:
        posf, velf, mass, accf, orig = carry[6:11]
        pos, vel, acc = _v3(posf), _v3(velf), _v3(accf)
        return ParticleState(
            pos=jnp.zeros((n, 3), pos.dtype).at[orig].set(pos),
            vel=jnp.zeros((n, 3), vel.dtype).at[orig].set(vel),
            mass=mass0,
            acc=jnp.zeros((n, 3), acc.dtype).at[orig].set(acc),
        )

    return init_carry, body, extract


def make_adaptive_runner(cfg: SimConfig, n_steps: int,
                         return_stats: bool = False):
    """A jittable function advancing a state by n_steps with ADAPTIVE,
    step-granular band rebuilds (cfg.adaptive_rebuild).

    Fixed-K reuse fails in the late-time dense core: per-particle skins
    v*dt*K grow past the local cell width (~3 units hot vs ~8 units of
    travel per step), flood the band caps, and the graceful coarse-
    monopole overflow fallback becomes a systematic theta violation that
    pumps energy (measured 6.6-13% kilostep drift at K=32 vs 0.16%
    per-step baseline; tools/_prof_stale.py, _prof_skinerr.py).

    The correct-by-construction scheme, one lax.while_loop iteration per
    STEP:

      * at each rebuild, every particle gets an envelope
          drift_i = min(v_i*dt*K*safety, skin_width_cap * w_loc_i)
        (w_loc = local Morton cell width) — skins never dwarf the local
        geometry, so the caps cannot be flooded by reuse margins;
      * each rebuild also computes a VALIDITY HORIZON: the largest step
        count s such that no particle's bounded travel (v s dt +
        1/2 a (s dt)^2, with headroom) exceeds its envelope; the
        structure is reused for exactly s steps (scalar countdown — no
        per-step array reductions), then rebuilt.  A freshly built
        structure used immediately is exact regardless of envelope size
        (zero staleness at evaluation time), so the hot core degrades
        gracefully to per-step rebuilds — round-1 physics — while
        halo-dominated epochs coast for ~K steps per rebuild at full
        reuse speed (measured kilostep drift 0.098% vs the 0.2% gate;
        cadence 10.7 steps at the IC, 1.4 hot);
      * the smooth far+mid component is refreshed on rebuild and at most
        every R = cfg.hold_farmid steps (r-RESPA hold), evaluated at the
        live positions; the exact near band is live every step.

    LOOP STRUCTURE: nested, not flat.  A flat per-step while_loop must
    CARRY the frozen band structures (supers + bands + tables, ~750 MB at
    1M with the demand-sized caps) through a rebuild lax.cond every step;
    here the OUTER loop rebuilds unconditionally and the INNER while_loop
    runs the validity-horizon's steps with the band pytree CLOSED OVER (a
    loop constant).  Measured at 1M the two compile to the same sustained
    rate (XLA aliases the flat carry's band buffers), but the nested form
    is the one whose inner-loop cost is auditable phase by phase
    (tools/_prof_inner.py) and it keeps the rebuild out of the per-step
    program.

    INNER CARRY LAYOUT: the inner loop carries the vector fields as
    [N, 3] when the padded footprint allows.  Per-step flat<->[N, 3]
    reshapes cost a measured +8 ms/step at 1M (each materializes the
    42.7x-padded tiled form, tools/_prof_inner.py "flat carries"), and a
    while-loop carry aliases across iterations, so carrying the padded
    form is a one-time memory cost, not per-step traffic: 4 fields x 128
    lanes x 4 B = 2 KB/particle (2 GB at 1M — fine; 8 GB at 4M — not).
    Above _INNER3_MAX_NPAD the inner loop falls back to flat [3N]
    carries, trading the reshapes for fitting in HBM; the OUTER carry is
    always flat (the rebuild re-materializes everything anyway).
    """
    r = max(1, cfg.hold_farmid)
    span = cfg.farmid_span_rebuilds
    _, _, extract = _adaptive_parts(cfg)
    rebuild_fn = _adaptive_rebuild_fn(cfg)

    def run(state: ParticleState) -> ParticleState:
        pos, vel, mass, acc, orig = _pad_cycle_state(state, cfg.force_tile)
        inner3 = pos.shape[0] <= _INNER3_MAX_NPAD
        carry0 = (jnp.int32(0), jnp.int32(0), jnp.int32(cfg.rebuild_every),
                  _flat(pos), _flat(vel), mass, _flat(acc), orig)
        if span:
            # the held far+mid acceleration SPANS rebuilds: it rides the
            # rebuild's packed permutation gather and is refreshed every
            # R steps REGARDLESS of the rebuild cadence — at the hot
            # state (validity horizon 1-2) the r-RESPA hold otherwise
            # never engages and the far+mid sweep is paid every step.
            # age starts AT r so the very first step refreshes.
            carry0 = carry0 + (jnp.int32(r), _flat(jnp.zeros_like(pos)))

        def outer_cond(s):
            return s[0] < n_steps

        def outer_body(s):
            i, n_rb, k_env = s[0], s[1], s[2]
            posf, velf, mass, accf, orig = s[3:8]
            if span:
                (posf, velf, mass, accf, orig, supers, bands, tables,
                 rctx), (s_valid, k_env), afmf0 = rebuild_fn(
                    posf, velf, mass, accf, orig, k_env, s[9]
                )
                age0 = s[8]
            else:
                (posf, velf, mass, accf, orig, supers, bands, tables,
                 rctx), (s_valid, k_env) = rebuild_fn(
                    posf, velf, mass, accf, orig, k_env
                )
                afmf0 = jnp.zeros_like(posf)
                age0 = jnp.int32(0)
            t_seg = jnp.minimum(s_valid, n_steps - i)
            # horizon-tied hold length (cfg.span_age_mult): at the hot
            # state (s_valid 1-2) the span hold shortens toward per-
            # rebuild freshness; calm epochs keep the full R.  Static R
            # when the knob is off.
            if span and cfg.span_age_mult > 0:
                r_eff = jnp.clip(cfg.span_age_mult * s_valid, 1, r)
                tau = 0.5 * (r_eff.astype(jnp.float32) - 1.0) * cfg.dt
            else:
                r_eff = jnp.int32(r)
                tau = 0.5 * (r - 1) * cfg.dt
            # carry-form converters: [N,3] carries when inner3, flat [3N]
            # otherwise (to3: carry -> [N,3]; toc: [N,3] -> carry)
            to3 = (lambda x: x) if inner3 else _v3
            toc = (lambda x: x) if inner3 else _flat

            def inner_cond(c):
                return c[0] < t_seg

            def inner_body(c):
                j, afm_age, afm, pos, vel, acc = c
                pos3 = to3(pos)
                # held-refresh target sampling per cfg.hold_predict.  The
                # r4 regression mechanism was span-hold STALENESS at the
                # hot state (structure rebuilds every 1-2 steps, the
                # span-held afm stays up to R=8 steps stale -> 0.72%
                # drift); midpoint prediction made it WORSE (ballistic
                # 1.24%, quadratic 1.47% — the core field rotates faster
                # than per-particle extrapolation), so the fix is
                # span_age_mult (staleness tied to the horizon), not
                # prediction (hold_predict_pos rationale).
                p_mid = hold_predict_pos(pos3, to3(vel), to3(acc), tau, cfg)
                # span: the carried afm stays valid across the rebuild
                # (re-permuted), so only AGE triggers a refresh (limit
                # r_eff — horizon-tied when cfg.span_age_mult is set)
                refresh = (afm_age >= r_eff) if span else (
                    (j == 0) | (afm_age >= r))
                if cfg.refresh_moments:
                    # j == 0: the rebuild's own tables are live-exact;
                    # later refreshes recompute moments at the frozen cut
                    # (sources at LIVE positions, targets at p_mid)
                    branch = jnp.where(
                        refresh, jnp.where(j == 0, 1, 2), 0
                    ).astype(jnp.int32)
                    afm3 = jax.lax.switch(
                        branch,
                        [lambda a: to3(afm),
                         lambda a: forces.apply_farmid(a[1], supers, tables,
                                                       cfg),
                         lambda a: forces.refresh_farmid(
                             a[0], mass, rctx[0], rctx[1], rctx[2], rctx[3],
                             bands, cfg, tgt_pos=a[1])],
                        (pos3, p_mid),
                    )
                else:
                    afm3 = jax.lax.cond(
                        refresh,
                        lambda p: forces.apply_farmid(p, supers, tables,
                                                      cfg),
                        lambda p: to3(afm),
                        p_mid,
                    )
                afm_age = jnp.where(refresh, 1, afm_age + 1)
                a = afm3 + forces.apply_near(pos3, pos3, mass, bands, cfg)
                st = integ.integrate(
                    ParticleState(pos=pos3, vel=to3(vel), mass=mass, acc=a),
                    a, cfg,
                )
                return (j + 1, afm_age, toc(afm3),
                        toc(st.pos), toc(st.vel), toc(a))

            j, age_o, afm_o, pos_o, vel_o, acc_o = jax.lax.while_loop(
                inner_cond, inner_body,
                (jnp.int32(0), age0,
                 toc(_v3(afmf0)) if span else toc(jnp.zeros_like(_v3(posf))),
                 toc(_v3(posf)), toc(_v3(velf)), toc(_v3(accf))),
            )
            out = (i + j, n_rb + 1, k_env,
                   _flat(to3(pos_o)), _flat(to3(vel_o)), mass,
                   _flat(to3(acc_o)), orig)
            if span:
                out = out + (age_o, _flat(to3(afm_o)))
            return out

        out = jax.lax.while_loop(outer_cond, outer_body, carry0)
        carry_like = (None,) * 6 + out[3:8]  # extract reads [6:11]
        result = extract(carry_like, state.pos.shape[0], state.mass)
        if return_stats:
            return result, out[1]
        return result

    return run


class AdaptiveStepper:
    """Persistent-carry adaptive runner for INTERACTIVE use.

    `Simulation.run_scan` re-enters make_adaptive_runner on every host
    call, and that runner's first act is a full band rebuild — correct
    for one-shot batch runs, but a live viewer stepping a few steps per
    frame would pay a rebuild per frame (the dominant cost: ~90 ms at
    500k vs ~30 ms for the steps themselves).  This class keeps the
    runner's carry (positions in Morton order, frozen band structures,
    validity countdown, held far+mid force) resident on device across
    host calls, so rebuilds happen exactly when the adaptive physics
    demands them — the same schedule and math as make_adaptive_runner,
    just split at host-call boundaries (test_simulation asserts an
    identical rebuild schedule and a last-ulp-tight trajectory match;
    the two compile as different XLA programs, so fusion may differ in
    the final ulp).
    """

    def __init__(self, cfg: SimConfig, state: ParticleState):
        init_carry, body, _extract = _adaptive_parts(cfg)
        self.cfg = cfg
        self._n = state.pos.shape[0]
        self._mass0 = state.mass
        self._extract = jax.jit(functools.partial(_extract, n=self._n))

        @functools.partial(jax.jit, static_argnums=1)
        def advance(carry, n_steps: int):
            carry = (jnp.int32(0),) + tuple(carry[1:])
            return jax.lax.while_loop(
                lambda s: s[0] < n_steps, body, carry
            )

        self._advance = advance
        self.carry = jax.jit(init_carry)(state)
        self.steps_done = 0

    def advance(self, n_steps: int) -> None:
        self.carry = self._advance(self.carry, n_steps)
        self.steps_done += n_steps

    @property
    def pos_sorted(self) -> jax.Array:
        """Live positions in the runner's internal Morton order (padded
        with clones of the last particle) — enough for rendering without
        the scatter back to original order."""
        return _v3(self.carry[6])

    @property
    def vel_sorted(self) -> jax.Array:
        return _v3(self.carry[7])

    def snapshot(self) -> ParticleState:
        """Full state in original particle order (for dumps/checkpoints)."""
        return self._extract(self.carry, mass0=self._mass0)


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
        self._overflow_checked = method != "barnes_hut" or not cfg.check_overflow

    def init_state(self) -> ParticleState:
        from nbody_tpu.init import make_initial_state

        return make_initial_state(self.cfg)

    def step(self, state: ParticleState) -> ParticleState:
        self._check_overflow(state)
        return self._step(state)

    def _check_overflow(self, state: ParticleState) -> None:
        """One-time host-side guard: cell-capacity overflow truncates whole
        cells (their mass vanishes from every band — a silently missing
        force, unlike the graceful band-cap path), so surface it loudly on
        the first step instead of only via metrics.bh_diagnostics.  Opt out
        with cfg.check_overflow=False."""
        if self._overflow_checked:
            return
        self._overflow_checked = True
        import warnings

        from nbody_tpu.ops.cells import build_source_cells

        def probe(pos, mass):
            # mirror the runtime build exactly (same code width, same g2
            # cap factor) so the guard can see grandchild-segment
            # overflow too; cut/segment counts are pure functions of the
            # codes, so drift skins are irrelevant here
            cs, perm, lo, size = sort_by_morton(pos, self.cfg)
            ps, ms, csp = forces.pad_sorted(
                pos[perm], mass[perm], cs, self.cfg.force_tile
            )
            cells = build_source_cells(
                csp, ps, ms, self.cfg.force_tile, self.cfg.g,
                self.cfg.cell_capacity, lo, size,
                g2_factor=self.cfg.g2_cap_factor,
            )
            return cells.overflow, cells.overflow_g2, cells.n_cells

        over, over_g2, n_cells = jax.jit(probe)(state.pos, state.mass)
        if bool(over):
            warnings.warn(
                f"adaptive-cell capacity overflow: n_cells={int(n_cells)} > "
                f"cell_capacity={self.cfg.cell_capacity}; truncated cells' "
                "mass is MISSING from all forces — raise cfg.cell_cap_factor "
                f"(now {self.cfg.cell_cap_factor})",
                RuntimeWarning, stacklevel=3,
            )
        elif bool(over_g2):
            # graceful: affected children lose grandchild refinement and
            # take the exact P2P path (cells.gchild_complete) — a perf
            # effect only, surfaced for tuning, never missing mass
            warnings.warn(
                "grandchild-segment cap overflow (graceful): some children "
                "take exact P2P instead of grandchild monopoles — raise "
                f"cfg.g2_cap_factor (now {self.cfg.g2_cap_factor}) to "
                "restore the cmid refinement for them",
                RuntimeWarning, stacklevel=3,
            )

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
            state = self.run_scan(state, k)
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
        """Advance n_steps inside compiled lax.scans — no per-step
        dispatch at all (the reference necessarily re-launches ~500 kernels
        per step from the host).  With cfg.rebuild_every = K > 1 the
        production path rebuilds bands once per K steps (skin cycles)."""
        self._check_overflow(state)
        k = self.cfg.rebuild_every
        if self.method != "barnes_hut" or k <= 1:
            return self._multi(n_steps)(state)
        if self.cfg.adaptive_rebuild:
            key = ("adaptive", n_steps)
            if key not in self._multi_cache:
                self._multi_cache[key] = jax.jit(
                    make_adaptive_runner(self.cfg, n_steps)
                )
            return self._multi_cache[key](state)
        n_cycles, rem = divmod(n_steps, k)
        if n_cycles:
            state = self._cycles(n_cycles, k)(state)
        if rem:
            state = self._cycles(1, rem)(state)
        return state

    def make_stepper(self, state: ParticleState) -> Optional[AdaptiveStepper]:
        """A persistent-carry stepper for interactive/viewer use, or None
        when the config has no reusable band state (direct method,
        per-step rebuilds, or fixed-K cycles).  See AdaptiveStepper."""
        if (self.method == "barnes_hut" and self.cfg.adaptive_rebuild
                and self.cfg.rebuild_every > 1):
            self._check_overflow(state)
            return AdaptiveStepper(self.cfg, state)
        return None

    def _cycles(self, n_cycles: int, k: int):
        key = ("cycles", n_cycles, k)
        if key not in self._multi_cache:
            self._multi_cache[key] = jax.jit(
                make_cycle_runner(self.cfg, n_cycles, k)
            )
        return self._multi_cache[key]
