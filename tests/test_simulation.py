"""End-to-end pipeline tests: integration semantics, physics sanity
(energy/momentum behavior), determinism, scan-loop equivalence."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from nbody_tpu.config import SimConfig
from nbody_tpu.state import ParticleState
from nbody_tpu.init import uniform_cube, disk_galaxy_jax
from nbody_tpu.models.simulation import Simulation, step_direct, step_barnes_hut
from nbody_tpu.ops.integrate import integrate
from nbody_tpu.utils import metrics


def test_integrate_euler_cromer_order():
    # velocity updates BEFORE position (nbody_v5.cu:258-275)
    cfg = SimConfig(n=1, dt=0.5, clamp_speed=False)
    s = ParticleState.create(
        pos=[[0.0, 0.0, 0.0]], vel=[[1.0, 0.0, 0.0]], mass=[1.0]
    )
    acc = jnp.asarray([[2.0, 0.0, 0.0]])
    out = integrate(s, acc, cfg)
    # v' = 1 + 2*0.5 = 2 ; x' = 0 + v'*0.5 = 1 (NOT 0.5 as explicit Euler)
    assert float(out.vel[0, 0]) == 2.0
    assert float(out.pos[0, 0]) == 1.0


def test_integrate_speed_clamp():
    cfg = SimConfig(n=1, dt=1.0, max_speed=500.0)
    s = ParticleState.create(pos=[[0.0] * 3], vel=[[0.0] * 3], mass=[1.0])
    acc = jnp.asarray([[1e4, 0.0, 0.0]])
    out = integrate(s, acc, cfg)
    assert abs(float(jnp.linalg.norm(out.vel))) == pytest.approx(500.0, rel=1e-5)
    cfg_off = cfg.replace(clamp_speed=False)
    out2 = integrate(s, acc, cfg_off)
    assert float(out2.vel[0, 0]) == pytest.approx(1e4)


def test_two_body_circular_orbit():
    # equal masses on a circular orbit stay at constant separation
    cfg = SimConfig(n=2, g=1.0, softening=1e-6, dt=1e-3, clamp_speed=False)
    m = 1.0
    r = 1.0
    # circular orbit about the barycenter: a = G m / r^2 = v^2 / (r/2)
    # => v = sqrt(G m / (2 r))
    v = np.sqrt(cfg.g * m / (2.0 * r))
    s = ParticleState.create(
        pos=[[-r / 2, 0, 0], [r / 2, 0, 0]],
        vel=[[0, -v, 0], [0, v, 0]],
        mass=[m, m],
    )
    sim = Simulation(cfg, method="direct")
    out = sim.run_scan(s, 2000)
    sep = float(jnp.linalg.norm(out.pos[1] - out.pos[0]))
    assert sep == pytest.approx(r, rel=2e-3)


def test_direct_energy_conservation_small():
    cfg = SimConfig(n=128, dt=0.005, clamp_speed=False)
    state = uniform_cube(128, seed=1, half=500.0)
    sim = Simulation(cfg, method="direct")
    e0 = float(metrics.total_energy(state, cfg))
    out = sim.run_scan(state, 500)
    e1 = float(metrics.total_energy(out, cfg))
    assert metrics.energy_drift(e0, e1) < 0.02


def test_bh_energy_drift_matches_direct():
    # BH (theta=0.5) drift must stay close to the direct integrator's drift
    n = 1024
    cfg = SimConfig(n=n, dt=0.01, theta=0.5, force_tile=256,
                    use_pallas=False, clamp_speed=False)
    state = disk_galaxy_jax(n, seed=2, g=cfg.g)
    e0 = float(metrics.total_energy(state, cfg))

    sim_d = Simulation(cfg, method="direct")
    sim_b = Simulation(cfg, method="barnes_hut")
    out_d = sim_d.run_scan(state, 200)
    out_b = sim_b.run_scan(state, 200)
    drift_d = metrics.energy_drift(e0, float(metrics.total_energy(out_d, cfg)))
    drift_b = metrics.energy_drift(e0, float(metrics.total_energy(out_b, cfg)))
    assert drift_b < max(3.0 * drift_d, 0.02), (drift_b, drift_d)


def test_momentum_conservation_direct():
    cfg = SimConfig(n=256, dt=0.01, clamp_speed=False)
    state = uniform_cube(256, seed=3)
    sim = Simulation(cfg, method="direct")
    out = sim.run_scan(state, 100)
    p0 = np.asarray(metrics.momentum(state))
    p1 = np.asarray(metrics.momentum(out))
    # direct softened forces are exactly antisymmetric -> momentum conserved
    np.testing.assert_allclose(p1, p0, atol=2e-2)


def test_step_determinism():
    cfg = SimConfig(n=512, force_tile=256, use_pallas=False)
    state = disk_galaxy_jax(512, seed=4, g=cfg.g)
    a = step_barnes_hut(state, cfg)
    b = step_barnes_hut(state, cfg)
    np.testing.assert_array_equal(np.asarray(a.pos), np.asarray(b.pos))
    np.testing.assert_array_equal(np.asarray(a.vel), np.asarray(b.vel))


def test_run_scan_matches_run():
    cfg = SimConfig(n=256, force_tile=256, use_pallas=False)
    state = disk_galaxy_jax(256, seed=5, g=cfg.g)
    sim = Simulation(cfg, method="barnes_hut")
    out_loop = sim.run(state, 5)
    out_scan = sim.run_scan(state, 5)
    np.testing.assert_allclose(
        np.asarray(out_loop.pos), np.asarray(out_scan.pos), rtol=1e-6, atol=1e-6
    )


def test_cycle_reuse_matches_per_step_rebuild():
    """rebuild_every=4 (frozen bands + skin margin) must track the
    per-step-rebuilt trajectory: over 8 steps of a 4096-body galaxy the
    positions should agree to a tiny fraction of the typical displacement
    (~ |v| dt * steps ~ 1.6 units here)."""
    n = 4096
    cfg1 = SimConfig(n=n, force_tile=256, use_pallas=False,
                     sup_cap=64, mid_cap=256, cmid_cap=512, near_cap=512)
    cfgk = cfg1.replace(rebuild_every=4)
    state = disk_galaxy_jax(n, seed=6, g=cfg1.g)
    out1 = Simulation(cfg1, method="barnes_hut").run_scan(state, 8)
    outk = Simulation(cfgk, method="barnes_hut").run_scan(state, 8)
    dp = np.linalg.norm(np.asarray(out1.pos) - np.asarray(outk.pos), axis=1)
    moved = np.linalg.norm(np.asarray(out1.pos) - np.asarray(state.pos), axis=1)
    assert np.median(moved) > 0.5          # the galaxy actually rotated
    assert np.max(dp) < 0.05 * max(np.median(moved), 1.0), (
        np.max(dp), np.median(moved)
    )


def test_hold_farmid_matches_per_step_farmid():
    """hold_farmid=4 (r-RESPA force splitting: far+mid evaluated once per
    4 steps, exact near band live every step) must track the per-step
    trajectory: the held component is smooth and theta-approximate, so its
    staleness error is far below the MAC truncation error."""
    n = 4096
    cfg1 = SimConfig(n=n, force_tile=256, use_pallas=False,
                     sup_cap=64, mid_cap=256, cmid_cap=512, near_cap=512,
                     rebuild_every=8)
    cfgr = cfg1.replace(hold_farmid=4)
    state = disk_galaxy_jax(n, seed=6, g=cfg1.g)
    out1 = Simulation(cfg1, method="barnes_hut").run_scan(state, 8)
    outr = Simulation(cfgr, method="barnes_hut").run_scan(state, 8)
    dp = np.linalg.norm(np.asarray(out1.pos) - np.asarray(outr.pos), axis=1)
    moved = np.linalg.norm(np.asarray(out1.pos) - np.asarray(state.pos), axis=1)
    assert np.median(moved) > 0.5
    assert np.max(dp) < 0.02 * max(np.median(moved), 1.0), (
        np.max(dp), np.median(moved)
    )


def test_adaptive_runner_tracks_per_step_rebuild():
    """The adaptive runner (skin envelopes + rebuild triggers) must track
    the per-step-rebuilt trajectory through an odd step count (exercises
    the remainder path) and keep particle identities."""
    n = 4096
    cfg1 = SimConfig(n=n, force_tile=256, use_pallas=False,
                     sup_cap=64, mid_cap=256, cmid_cap=512, near_cap=512)
    cfga = cfg1.replace(rebuild_every=16, hold_farmid=4)
    assert cfga.adaptive_rebuild
    state = disk_galaxy_jax(n, seed=6, g=cfg1.g)
    out1 = Simulation(cfg1, method="barnes_hut").run_scan(state, 11)
    outa = Simulation(cfga, method="barnes_hut").run_scan(state, 11)
    np.testing.assert_array_equal(np.asarray(outa.mass), np.asarray(state.mass))
    dp = np.linalg.norm(np.asarray(out1.pos) - np.asarray(outa.pos), axis=1)
    moved = np.linalg.norm(np.asarray(out1.pos) - np.asarray(state.pos), axis=1)
    assert np.median(moved) > 0.5
    assert np.max(dp) < 0.05 * max(np.median(moved), 1.0), (
        np.max(dp), np.median(moved)
    )


def test_adaptive_stepper_matches_runner():
    """The persistent-carry stepper (viewer path) split across several
    host calls must implement the SAME SCHEDULE as the one-shot adaptive
    runner: same rebuild triggers, same held far+mid, same integration —
    the carry is the same, only the host-call boundaries differ.

    The comparison is a tight allclose, not bit-equality: the two are
    differently structured XLA programs (the runner nests its inner loop
    with [N, 3] carries; the stepper's flat body must survive host-call
    boundaries), so fusion choices may differ in the last ulp.  A
    schedule divergence (missed rebuild/refresh) would show up both as
    an O(1e-3+) trajectory split within these 13 steps and as a rebuild
    count mismatch, asserted exactly below."""
    n = 2048
    cfg = SimConfig(n=n, force_tile=256, use_pallas=False,
                    rebuild_every=16, hold_farmid=4,
                    sup_cap=64, mid_cap=256, cmid_cap=512, near_cap=512,
                    check_overflow=False)
    state = disk_galaxy_jax(n, seed=7, g=cfg.g)
    sim = Simulation(cfg, method="barnes_hut")
    from nbody_tpu.models.simulation import make_adaptive_runner
    out, n_rb = jax.jit(make_adaptive_runner(cfg, 13, return_stats=True))(
        state)

    stepper = sim.make_stepper(state)
    assert stepper is not None
    for k in (5, 5, 3):          # 13 steps over three uneven calls
        stepper.advance(k)
    snap = stepper.snapshot()
    assert int(stepper.carry[3]) == int(n_rb)   # identical rebuild schedule
    np.testing.assert_allclose(np.asarray(snap.pos), np.asarray(out.pos),
                               rtol=2e-6, atol=2e-4)
    np.testing.assert_allclose(np.asarray(snap.vel), np.asarray(out.vel),
                               rtol=2e-6, atol=2e-4)
    np.testing.assert_array_equal(np.asarray(snap.mass), np.asarray(state.mass))
    # rendering path: sorted views exist, padded to the force tile
    assert stepper.pos_sorted.shape[0] % cfg.force_tile == 0
    # no reusable state => no stepper
    assert Simulation(cfg.replace(rebuild_every=1)).make_stepper(state) is None


def test_local_width_tracks_density():
    """forces.local_width: dense regions must get smaller local widths
    than sparse ones, and widths lie within the Morton lattice range."""
    import jax.numpy as jnp
    from nbody_tpu.ops import bbox, morton, forces

    rng = np.random.default_rng(3)
    dense = rng.normal(0.0, 1.0, (4096, 3)).astype(np.float32)
    sparse = rng.uniform(-800.0, 800.0, (512, 3)).astype(np.float32)
    pos = jnp.asarray(np.concatenate([dense, sparse]))
    lo, size = bbox.bounding_cube(pos)
    codes, perm = morton.morton_sort_30(morton.encode30(pos, lo, size))
    w = np.asarray(forces.local_width(codes, size, 256))
    is_dense = np.asarray(perm) < 4096
    assert np.median(w[is_dense]) < 0.1 * np.median(w[~is_dense])
    assert w.max() <= float(size) + 1e-3
    assert w.min() > 0


def test_hold_farmid_non_divisor_falls_back():
    """hold_farmid that does not divide rebuild_every falls back to
    per-step far+mid instead of mis-stepping."""
    n = 512
    cfg = SimConfig(n=n, force_tile=64, use_pallas=False,
                    rebuild_every=4, hold_farmid=3)
    state = disk_galaxy_jax(n, seed=9, g=cfg.g)
    out = Simulation(cfg, method="barnes_hut").run_scan(state, 4)
    assert out.pos.shape == (n, 3)
    assert bool(np.all(np.isfinite(np.asarray(out.pos))))


def test_cycle_reuse_remainder_and_padding():
    """n not a multiple of force_tile, n_steps not a multiple of K: the
    cycle path must still advance exactly n_steps and keep particle
    identities (mass unchanged, padding rows dropped)."""
    n = 1000
    cfg1 = SimConfig(n=n, force_tile=256, use_pallas=False,
                     sup_cap=32, mid_cap=128, cmid_cap=256, near_cap=256)
    cfgk = cfg1.replace(rebuild_every=4)
    state = disk_galaxy_jax(n, seed=7, g=cfg1.g)
    out1 = Simulation(cfg1, method="barnes_hut").run_scan(state, 6)
    outk = Simulation(cfgk, method="barnes_hut").run_scan(state, 6)
    assert outk.pos.shape == (n, 3)
    np.testing.assert_array_equal(np.asarray(outk.mass), np.asarray(state.mass))
    dp = np.linalg.norm(np.asarray(out1.pos) - np.asarray(outk.pos), axis=1)
    assert np.max(dp) < 0.2, np.max(dp)


def test_morton63_honored_by_cycle_runner():
    """bh_legacy-style configs (morton_bits=63) with rebuild_every>1 must
    sort on the 63-bit legacy keys, tracking the per-step 63-bit path —
    not silently switch to 30-bit sort semantics."""
    n = 2000
    base = SimConfig(n=n, force_tile=256, use_pallas=False,
                     morton_bits=63, legacy_softening=True,
                     clamp_speed=False, dt=0.03,
                     sup_cap=64, mid_cap=256, cmid_cap=512, near_cap=512)
    cfgk = base.replace(rebuild_every=4, adaptive_rebuild=False)
    cfga = base.replace(rebuild_every=8, hold_farmid=4)
    state = disk_galaxy_jax(n, seed=12, g=base.g)
    out1 = Simulation(base, method="barnes_hut").run_scan(state, 8)
    outk = Simulation(cfgk, method="barnes_hut").run_scan(state, 8)
    outa = Simulation(cfga, method="barnes_hut").run_scan(state, 8)
    moved = np.linalg.norm(np.asarray(out1.pos) - np.asarray(state.pos), axis=1)
    assert np.median(moved) > 0.1
    for out in (outk, outa):
        dp = np.linalg.norm(np.asarray(out1.pos) - np.asarray(out.pos), axis=1)
        assert np.max(dp) < 0.05 * max(np.median(moved), 1.0), np.max(dp)


def test_hold_farmid_non_divisor_raises_for_fixed_k():
    """With adaptive_rebuild=False, a hold that does not divide the cycle
    is a config error (it would silently disable the r-RESPA hold)."""
    import pytest

    with pytest.raises(ValueError, match="hold_farmid"):
        SimConfig(n=512, rebuild_every=4, hold_farmid=3,
                  adaptive_rebuild=False)


def test_farmid_span_rebuilds_tracks_exact():
    """cfg.farmid_span_rebuilds carries the held far+mid accel ACROSS
    rebuilds (re-permuted through the rebuild's packed gather) so the
    r-RESPA hold engages even when the validity horizon is 1.  Both
    runner forms must (a) track the exact hold_farmid=1 trajectory
    within r-RESPA tolerance, and (b) agree with each other on the same
    schedule."""
    n = 2048
    base = SimConfig(n=n, force_tile=256, use_pallas=False,
                     rebuild_every=8, hold_farmid=5,   # 5 !| horizons:
                     sup_cap=64, mid_cap=256, cmid_cap=512, near_cap=512,
                     check_overflow=False)             # refreshes land
    cfg = base.replace(farmid_span_rebuilds=True)      # mid-segment
    state = disk_galaxy_jax(n, seed=9, g=base.g)
    from nbody_tpu.models.simulation import make_adaptive_runner

    exact = Simulation(base.replace(hold_farmid=1)).run_scan(state, 13)
    got = jax.jit(make_adaptive_runner(cfg, 13))(state)
    moved = np.linalg.norm(np.asarray(exact.pos) - np.asarray(state.pos),
                           axis=1)
    dp = np.linalg.norm(np.asarray(exact.pos) - np.asarray(got.pos), axis=1)
    assert np.median(moved) > 0.5
    assert np.max(dp) < 0.05 * max(np.median(moved), 1.0), (
        np.max(dp), np.median(moved))

    # the stepper path implements the same span schedule
    stepper = Simulation(cfg).make_stepper(state)
    for k in (4, 6, 3):
        stepper.advance(k)
    snap = stepper.snapshot()
    np.testing.assert_allclose(np.asarray(snap.pos), np.asarray(got.pos),
                               rtol=2e-6, atol=2e-4)
