"""Simulation configuration.

The CUDA reference hardcodes every parameter as a compile-time ``#define``
(reference: nbody_v5.cu:15-21, nbody_v5.cu:34; README.md:62-68).  Here they
live in a hashable dataclass so a config can be a static argument to
``jax.jit`` — changing a parameter triggers a recompile, exactly like
recompiling the CUDA binary, but from Python.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple


@dataclasses.dataclass(frozen=True)
class SimConfig:
    """All knobs of the simulation.

    Defaults mirror the reference constants (nbody_v5.cu:15-21):
    THREADS_PER_BLOCK is a GPU notion and has no equivalent; its TPU analog
    is ``force_tile`` (particles per traversal tile).
    """

    # --- workload ---
    n: int = 500_000               # particle count (nbody_v5.cu:34)
    # --- physics (nbody_v5.cu:16-21) ---
    g: float = 0.5                 # G_CONST
    theta: float = 0.5             # THETA — Barnes-Hut opening angle
    dt: float = 0.02               # DT
    softening: float = 50.0        # SOFTENING, added to the *squared* distance
                                   # (v5 semantics, nbody_v5.cu:231); the
                                   # legacy nbody_bh used softening^2 — set
                                   # `legacy_softening=True` for that.
    max_speed: float = 500.0       # MAX_SPEED clamp (nbody_v5.cu:262-269)
    damping: float = 1.0           # DAMPING (defined but disabled in v5)
    legacy_softening: bool = False # use d^2 + softening^2 (basics.txt:104)
    clamp_speed: bool = True       # v5 clamps; legacy nbody_bh does not
    # --- tree / traversal ---
    morton_bits: int = 63          # 63 (production default: 21-level
                                   # adaptive cells — the 30-bit lattice
                                   # floors cell width at box/1024, which
                                   # degenerates a contracted core or an
                                   # expanded box to unbounded exact-P2P
                                   # demand) or 30 (v5 sort-key parity,
                                   # 10 levels)
    force_tile: int = 256          # particles per force group (B)
    # Band caps sized from MEASURED demand (tools/_prof_capdemand.py at 1M,
    # IC and after 1024 steps): live maxima sup 227 / mid 272 / cmid 463 /
    # near 357, and near-IC 16-step reuse skins push near to ~973.  The
    # caps below cover all of it, so the headline bench runs with
    # overflow_bands=false; overflow remains GRACEFUL (coarser monopole)
    # if an unforeseen state exceeds them, and the adaptive runner then
    # shrinks its envelope horizon until demand fits (k_env feedback,
    # models/simulation.py).
    ss_cap: int = 192              # max MAC-failing SUPER-SUPERS (level-3
                                   # aggregates of 64 cells — the far
                                   # sweep's source level) per target;
                                   # each refines to its 8 member supers
                                   # (+ anti-SS row).  At 1M there are
                                   # only ~171 super-supers total, so the
                                   # default can never overflow there;
                                   # overflow is graceful (the SS keeps
                                   # its own monopole) and flagged
    sup_cap: int = 256             # max MAC-failing supers per target
                                   # (each refines to 8 cells; overflow
                                   # flagged)
    mid_cap: int = 320             # max failing cells per target (each
                                   # refines to 8 children; overflow
                                   # flagged)
    cmid_cap: int = 512            # max failing children per target that
                                   # refine to grandchild monopoles
                                   # (overflow flagged)
    near_cap: int = 1024           # max near-band (exact P2P) source
                                   # children per target (overflow flagged)
    win_cap: int = 512             # max DISTINCT deduplicated P2P source
                                   # windows per target (measured demand
                                   # max 345 at the 1M hot state with
                                   # 16-step skins, ~28-34 mean).  Beyond
                                   # it, trailing near children are
                                   # dropped WITH their anti-rows (they
                                   # keep their own child monopole —
                                   # graceful), flagged as near overflow.
                                   # Sized well under 2*near_cap because
                                   # the near kernel DMAs its window rows
                                   # into SMEM per target: 2*near_cap
                                   # slots quadrupled that row DMA and
                                   # cost ~10 ms/step at 1M
    cell_cap_factor: int = 5       # adaptive-cell capacity multiplier:
                                   # capacity = factor * ceil(n/force_tile).
                                   # Measured n_cells at 1M: ~2.5x n/tile
                                   # at the IC but FLUCTUATING 3.1-4.3x at
                                   # the 1024-step contracted core
                                   # (tools/_prof_crash1m.py r4: 17429 =
                                   # 4.25x peak) — factor 4 tripped the
                                   # cell overflow (MISSING mass, the one
                                   # non-graceful overflow) at the hot
                                   # state; 5 covers the peak with ~18%
                                   # headroom
    g2_cap_factor: int = 4         # grandchild segment capacity as a
                                   # multiple of the child capacity
                                   # (structural max 8; measured demand
                                   # 384k vs 3*c_cap=376k at the 1M IC —
                                   # factor 3 tripped the graceful
                                   # overflow and sent those children to
                                   # exact P2P); every rebuild pays gather
                                   # traffic proportional to this cap
    no_ss: bool = False            # neutralize the level-3 super-super
                                   # monopoles: every SS fails its MAC
                                   # (diam forced huge), so the far
                                   # field telescopes to SUPER monopoles
                                   # exactly as in round 3 (the SS far
                                   # term is cancelled by the anti-SS
                                   # row).  The SS level's coarse
                                   # monopoles are the measured dominant
                                   # secular-cooling bias at the 1M hot
                                   # core (tools/_prof_fbias.py: drift
                                   # slope -1.33e-3/128 steps with SS
                                   # vs -9.1e-4 at tile 256); disabling
                                   # costs the far sweep O(N*S) instead
                                   # of O(N*S/8) — ~5 ms per refresh at
                                   # 1M, the 4M-scaling reason SS
                                   # exists.  Requires ss_cap >= n_ss
                                   # (overflow stays graceful: an
                                   # overflowed SS keeps its monopole)
    use_pallas: bool = True        # Pallas force kernels vs pure-jnp
    rebuild_every: int = 1         # K: rebuild sort/cells/bands every K
                                   # steps; between rebuilds the frozen
                                   # band structure stays conservative via
                                   # a skin margin (models/simulation.py)
    skin_safety: float = 1.3       # safety factor on the per-cycle drift
                                   # bound that sets the skin margin
    adaptive_rebuild: bool = True  # rebuild when any particle nears its
                                   # skin envelope instead of on a fixed
                                   # K-step schedule: early (halo-
                                   # dominated) epochs coast at K =
                                   # rebuild_every, the late dense core
                                   # triggers rebuilds as often as its
                                   # dynamics demand (physics-safe reuse)
    skin_width_cap: float = 0.75   # cap each particle's skin at this
                                   # fraction of its LOCAL cell width
                                   # (forces.local_width) so fast-core
                                   # skins cannot flood the band caps
    skin_width_floor: float = 2.0**-10  # floor the width feeding that cap
                                   # at this fraction of the box (the
                                   # 30-bit lattice cell) — without it one
                                   # dense run under 63-bit codes pins the
                                   # global-min validity horizon at 1
    horizon_floor: int = 1         # lower bound on the adaptive validity
                                   # horizon (models/simulation.
                                   # validity_horizon).  The horizon is
                                   # the GLOBAL min over particles, and
                                   # at the 1M hot state the single
                                   # fastest core particle pins it at 1
                                   # (tools/_prof_hotcfg: s_valid stays 1
                                   # even at skin_width_cap 2.5) — per-
                                   # step rebuilds for everyone.  A floor
                                   # of f deliberately lets the fastest
                                   # tail run up to f-1 steps past its
                                   # skin envelope: a bounded LOCAL theta
                                   # violation (those particles' near
                                   # band stays exact/live; only their
                                   # far/mid classification staleness
                                   # grows by the excess travel), traded
                                   # for 1/f the hot-state rebuild
                                   # cadence.  Kilostep-gated before
                                   # shipping; 1 = off (strict horizon)
    hold_farmid: int = 1           # R: inside a reuse cycle, evaluate the
                                   # smooth far+mid bands once per R steps
                                   # (r-RESPA force splitting); the exact
                                   # near band stays live every step.
                                   # Must divide rebuild_every; 1 = off
    farmid_span_rebuilds: bool = False  # carry the held far+mid accel
                                   # ACROSS rebuilds (re-permuted through
                                   # the rebuild's packed gather) so the
                                   # r-RESPA hold engages even at the hot
                                   # state, whose validity horizon of 1-2
                                   # otherwise forces a far+mid sweep
                                   # every step.  Physics identical to
                                   # holding within a cycle (staleness is
                                   # still <= R steps); kilostep-gated
                                   # before shipping (PERF.md round-4).
                                   # Adaptive single-chip runners only —
                                   # the sharded twins keep the in-cycle
                                   # hold, so equivalence tests must run
                                   # with this off.
    span_age_mult: int = 0         # with farmid_span_rebuilds: tie the
                                   # held far+mid refresh age to the
                                   # validity horizon — effective hold
                                   # R_eff = clip(mult * s_valid, 1, R)
                                   # recomputed at each rebuild.  At the
                                   # hot state (horizon 1-2) the hold
                                   # shortens to 2-4 steps, restoring
                                   # near-per-rebuild far+mid freshness
                                   # (round-3 physics) while calm epochs
                                   # keep the full R-step hold; 0 = off
                                   # (fixed R).  The kilostep gate
                                   # decides between this and the
                                   # quadratic-midpoint hold
    hold_predict: int = 0          # how the held far+mid samples target
                                   # positions at each refresh (r-RESPA
                                   # hold, tau = 0.5*(R_eff-1)*dt):
                                   #   0 = at the CURRENT positions
                                   #       (first-order hold)
                                   #   1 = ballistic midpoint p + v*tau
                                   #   2 = quadratic midpoint
                                   #       p + v*tau + 0.5*a*tau^2
                                   # Kilostep-measured at the shipped
                                   # span config (1M, 1024 steps):
                                   # first-order 0.72%, ballistic 1.24%,
                                   # quadratic 1.47% — midpoint
                                   # PREDICTION is actively harmful in
                                   # the contracted core (the field
                                   # rotates faster than any per-particle
                                   # extrapolation), so 0 ships and the
                                   # hot-state staleness is handled by
                                   # span_age_mult instead
    refresh_moments: bool = False  # at each far+mid refresh, RECOMPUTE
                                   # all source moments from live
                                   # positions at the frozen cut and
                                   # regather the tables
                                   # (forces.refresh_farmid) instead of
                                   # reusing the rebuild-time monopoles —
                                   # removes the dominant reuse staleness
                                   # term for ~48 ms per refresh at 1M
                                   # (adaptive runner only)
    check_overflow: bool = True    # one-time host probe on the first
                                   # Simulation.step: warn if the adaptive
                                   # cell cut overflows cell_capacity
                                   # (truncation = silently missing mass)
    # --- initial conditions (nbody_v5.cu:395-414) ---
    seed: int = 42
    ic_kind: str = "disk_galaxy"   # "disk_galaxy" (v5) | "legacy_disk"
                                   # (basics.txt:146-150) | "uniform_cube"
    ic_rng: str = "msvc_rand"      # "msvc_rand" (bit-parity with srand(42)
                                   # C rand() on Windows) | "jax"
    # --- parallelism ---
    mesh_shape: Tuple[int, ...] = ()   # () = single device
    near_halo_div: int = 8         # sharded near band: per-step halo =
                                   # slab_rows / near_halo_div (span-
                                   # aligned; parallel/shard._near_halo_rows)
                                   # exchanged by ppermute instead of an
                                   # O(N) live-position all_gather; a
                                   # replicated per-cycle predicate falls
                                   # back to the full gather when any
                                   # frozen window reaches past the halo
    near_fetch_cap: int = 512      # sharded near band: max DISTINCT
                                   # out-of-halo SPAN_ALIGN-row windows
                                   # per chip fetched per step by a
                                   # fixed-size all_to_all (the disk
                                   # galaxy's dense core sits at the
                                   # 8-octant Morton seam, so its near
                                   # windows are rank-scattered and a
                                   # contiguous halo can never cover
                                   # them — parallel/shard.
                                   # _near_fetch_plan).  Per-step wire
                                   # cost D*cap*128 rows vs the O(N)
                                   # live-position all_gather fallback;
                                   # 0 disables (halo-only reach + full
                                   # gather past it)
    # --- render (nbody_v5.cu:35-36, 385-389, 470-473) ---
    render_width: int = 1280
    render_height: int = 720
    cam_distance: float = 4000.0
    cam_rot_x: float = 30.0
    cam_rot_y: float = 45.0
    fov_deg: float = 45.0

    def __post_init__(self):
        if self.n <= 0:
            raise ValueError(f"n must be positive, got {self.n}")
        if self.morton_bits not in (30, 63):
            raise ValueError("morton_bits must be 30 or 63")
        if self.softening <= 0:
            raise ValueError(
                "softening must be positive: the force law divides by "
                "sqrt(d^2 + softening) and self-interactions rely on it"
            )
        if self.force_tile % (8 * 8):
            raise ValueError("force_tile must be a multiple of 64 "
                             "(8 sub-blocks, 128-lane DMA alignment /2)")
        if self.use_pallas and self.force_tile % 128:
            # Pallas panels tile targets at (8,128); a non-multiple tile
            # would leave ragged target blocks.
            raise ValueError("force_tile must be a multiple of 128 when "
                             "use_pallas=True")
        if self.force_tile > 1024:
            # Near-band child runs are force_tile/8 particles; the span
            # splitter assumes a child fits in at most two SPAN_ALIGN=128
            # windows, i.e. force_tile/8 <= 128.
            raise ValueError("force_tile must be <= 1024")
        if (
            not self.adaptive_rebuild
            and self.hold_farmid > 1
            and self.rebuild_every % self.hold_farmid
        ):
            # the fixed-K cycle runner holds far+mid in sub-cycles of
            # exactly hold_farmid steps; a non-divisor would silently
            # disable the hold (the adaptive runner refreshes on an age
            # counter instead and has no divisibility requirement)
            raise ValueError(
                f"hold_farmid={self.hold_farmid} must divide "
                f"rebuild_every={self.rebuild_every} when "
                "adaptive_rebuild=False (the fixed-K cycle runner would "
                "otherwise silently disable the far+mid hold)"
            )

    @property
    def n_groups(self) -> int:
        """Target blocks after padding to a force_tile multiple."""
        return -(-self.n // self.force_tile)

    @property
    def win_pieces(self) -> int:
        """Aligned windows one near-child run can touch: the adaptive
        cut bounds CELLS at force_tile bodies, and a degenerate octant
        can put nearly all of them in ONE child, so runs are bounded by
        force_tile (NOT force_tile/8) — ceil(force_tile/128)+1 windows.
        The window splitter must emit this many pieces per child or it
        DROPS interior windows (missing mass — the silent-error class
        fixed in round 5; see ops/forces._pieces)."""
        return -(-self.force_tile // 128) + 1

    @property
    def win_cap_eff(self) -> int:
        """Effective per-target window-slot cap: win_pieces*near_cap is
        the structural maximum, so win_cap clamps to it."""
        return min(self.win_cap, self.win_pieces * self.near_cap)

    @property
    def cell_capacity(self) -> int:
        """Static capacity for adaptive source cells (multiple of 64, so
        cells group into whole supers and supers into whole super-supers
        with no ragged tail)."""
        cap = self.cell_cap_factor * self.n_groups + 64
        return -(-cap // 64) * 64

    @property
    def table_bytes(self) -> int:
        """HBM footprint of ONE TableSet generation (4 fp32 planes of
        near_cap + 9*(sup+mid+cmid) rows per target).  The band-reuse
        runners hold up to TWO generations live while a rebuild computes
        the next tables, so ~2x this plus state must fit in HBM — the
        measured failure mode at 4M with generously sized caps was the
        TPU worker dying in exactly that double-buffered window."""
        rows = self.near_cap + 9 * (
            self.ss_cap + self.sup_cap + self.mid_cap + self.cmid_cap
        )
        return 4 * 4 * self.n_groups * rows

    def replace(self, **kw) -> "SimConfig":
        return dataclasses.replace(self, **kw)


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


# Workload presets mirroring the reference's four program generations
# (SURVEY.md §2.1) plus the driver's benchmark configs (BASELINE.json).
PRESETS = {
    # nbody_simple: direct all-pairs O(N^2), CPU-runnable oracle size.
    "simple": SimConfig(n=4096),
    # nbody_bh legacy golden-file workload (output_bh.txt:1-4).
    "bh_legacy": SimConfig(
        n=10_000, theta=0.5, dt=0.03, morton_bits=63,
        legacy_softening=True, clamp_speed=False, ic_kind="legacy_disk",
    ),
    # nbody_v5 interactive (nbody_v5.cu:34).  Same shipping knobs as the
    # gated bench config below.
    "v5": SimConfig(n=500_000, rebuild_every=16, hold_farmid=8,
                    force_tile=512, farmid_span_rebuilds=True,
                    span_age_mult=1, no_ss=True),
    # nbody_v5_bench at README/binary N (README.md:23) — THE shipping
    # config: what bench.py runs (it reads this preset), what the
    # kilostep gate (tools/_prof_kilostep.py) certifies, and what
    # README/PERF quote.  Adaptive envelope-triggered rebuilds with a
    # K=16 horizon; far+mid held R=8 steps (r-RESPA) and carried ACROSS
    # rebuilds (span) with the hold age tied to the validity horizon
    # (span_age_mult=1: full R=8 hold in calm epochs, per-step-fresh in
    # the hot core); held refresh samples CURRENT positions
    # (hold_predict=0 — midpoint prediction measured harmful); SS
    # monopoles neutralized (no_ss: the level-3 far field was the
    # second-largest secular-bias term); force_tile=512 (PERF.md
    # round-4: beats 256 at both epochs).  Kilostep-gated at 1024 steps
    # via metrics.drift_protocol — the SAME protocol bench.py reports:
    # drift_1024 = 0.00173 vs the 0.002 criterion (round 5, after the
    # window-mass fix).
    "v5_bench": SimConfig(n=1_000_000, rebuild_every=16, hold_farmid=8,
                          force_tile=512, farmid_span_rebuilds=True,
                          span_age_mult=1, no_ss=True),
    # BASELINE config 2.
    "bh_100k": SimConfig(n=100_000, rebuild_every=16, hold_farmid=8),
    # BASELINE config 5's workload on ONE chip, 4M-tuned (PERF.md "4M
    # retune"): force_tile=512 halves the super count (the far sweep and
    # classify stage 1 are O(N*S) — tile 256 is 16x the 1M cost at 4M),
    # caps sized from measured 4M demand (live sup max 277 / mid 250 /
    # cmid 650 / near 473; 8-step skins), K=8 because 16-step envelopes
    # saturate any affordable near cap at 4M.  Measured 843-851 ms/step
    # sustained with overflow=false (vs 910 overflow=true before the
    # retune).
    "bh_4m": SimConfig(n=4_000_000, force_tile=512, rebuild_every=8,
                       hold_farmid=4, sup_cap=384, mid_cap=512,
                       cmid_cap=768, near_cap=1536, g2_cap_factor=6),
    # BASELINE config 5: multi-chip (same tuned shape over a v5e-8 mesh).
    "sharded_4m": SimConfig(n=4_000_000, mesh_shape=(8,), force_tile=512,
                            rebuild_every=8, hold_farmid=4, sup_cap=384,
                            mid_cap=512, cmid_cap=768, near_cap=1536,
                            g2_cap_factor=6),
}
