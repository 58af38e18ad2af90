"""Initial conditions (MSVC rand parity), dumps, golden file, checkpoints."""

import os

import numpy as np
import pytest

from nbody_tpu.config import SimConfig, PRESETS
from nbody_tpu.init import (
    msvc_rand_sequence, disk_galaxy_msvc, disk_galaxy_jax, legacy_disk,
    make_initial_state,
)
from nbody_tpu.utils import io, metrics

GOLDEN = "/root/reference/output_bh.txt"


def _msvc_rand_scalar(seed, count):
    s = seed & 0xFFFFFFFF
    out = []
    for _ in range(count):
        s = (s * 214013 + 2531011) & 0xFFFFFFFF
        out.append((s >> 16) & 0x7FFF)
    return np.array(out, np.uint16)


def test_msvc_lcg_bit_parity():
    got = msvc_rand_sequence(42, 5000)
    want = _msvc_rand_scalar(42, 5000)
    np.testing.assert_array_equal(got, want)
    # known first values of MSVC rand() after srand(42)
    assert list(msvc_rand_sequence(42, 3)) == [175, 400, 17869]


def test_disk_galaxy_msvc_matches_v5_math():
    st = disk_galaxy_msvc(1000, seed=42, g=0.5)
    pos = np.asarray(st.pos)
    r = np.linalg.norm(pos[:, :2], axis=1)
    assert r.min() >= 199.0 and r.max() <= 1701.0          # r in [200, 1700]
    m = np.asarray(st.mass)
    assert m.min() >= 2.0 and m.max() <= 7.0               # mass in [2, 7]
    assert np.abs(pos[:, 2]).max() <= 0.025 * 1700 + 1     # thin disk
    # tangential speed ~ sqrt(G*(50000+100r)/r)
    vel = np.asarray(st.vel)
    vmag = np.linalg.norm(vel[:, :2], axis=1)
    want = np.sqrt(0.5 * (50000.0 + 100.0 * r) / r)
    np.testing.assert_allclose(vmag, want, rtol=0.02)


def test_disk_galaxy_jax_same_distribution():
    a = disk_galaxy_msvc(20_000, 42, 0.5)
    b = disk_galaxy_jax(20_000, 42, 0.5)
    ra = np.linalg.norm(np.asarray(a.pos)[:, :2], axis=1)
    rb = np.linalg.norm(np.asarray(b.pos)[:, :2], axis=1)
    assert abs(ra.mean() - rb.mean()) / ra.mean() < 0.02
    assert abs(np.asarray(a.mass).mean() - np.asarray(b.mass).mean()) < 0.05


def test_presets_make_state():
    cfg = PRESETS["simple"]
    st = make_initial_state(cfg)
    assert st.n == cfg.n


def test_dump_roundtrip(tmp_path):
    cfg = SimConfig(n=100)
    st = disk_galaxy_msvc(100, 42, cfg.g)
    path = str(tmp_path / "out.txt")
    io.dump_state_text(path, st, cfg, n_steps=7)
    meta, rows = io.load_dump(path)
    assert meta["bodies"] == 100
    assert meta["theta"] == pytest.approx(0.5)
    assert meta["dt"] == pytest.approx(0.02)
    assert rows.shape == (100, 6)
    np.testing.assert_allclose(rows[:, :3], np.asarray(st.pos), atol=5e-7 * np.abs(np.asarray(st.pos)).max() + 1e-6)


@pytest.mark.skipif(not os.path.exists(GOLDEN), reason="reference golden absent")
def test_golden_file_parses_and_stats():
    meta, rows = io.load_dump(GOLDEN)
    assert meta["bodies"] == 10000
    assert meta["theta"] == pytest.approx(0.5)
    assert meta["dt"] == pytest.approx(0.03)
    assert rows.shape == (10000, 6)
    # documented quirk: the legacy run produced vz == 0 for every body
    assert np.all(rows[:, 5] == 0.0)


def _ks_distance(a: np.ndarray, b: np.ndarray) -> float:
    """Two-sample Kolmogorov-Smirnov statistic (no scipy dependency)."""
    a = np.sort(a)
    b = np.sort(b)
    allv = np.sort(np.concatenate([a, b]))
    ca = np.searchsorted(a, allv, side="right") / len(a)
    cb = np.searchsorted(b, allv, side="right") / len(b)
    return float(np.max(np.abs(ca - cb)))


@pytest.mark.skipif(not os.path.exists(GOLDEN), reason="reference golden absent")
def test_bh_legacy_distribution_parity_with_golden():
    """Golden-artifact parity at the golden's ACTUAL workload: 10,000
    bodies, 100 steps, theta=0.5, dt=0.03 (output_bh.txt:1-4).

    The nbody_bh source and its RNG seed are lost (SURVEY.md §2.1), so
    trajectory parity is impossible; instead the final radial and speed
    DISTRIBUTIONS must match the golden's within a KS distance close to
    the ~0.02 sampling floor (measured ks_r=0.018, ks_v=0.021; the 1%
    critical value for two n=10k samples is 0.023), plus medians within
    5% and conservation (energy drift, momentum).  A broken build /
    classification / force path shifts these far past the bounds.
    Calibration note: a *uniform* +-20% G error is NOT detectable from
    this artifact (measured ks shift < 0.002 — the legacy IC's dynamics
    are IC-dominated over 100 steps); force accuracy at the 0.05% level
    is enforced by the BH-vs-direct oracle tests in test_forces.py.
    """
    from nbody_tpu.models.simulation import Simulation
    from nbody_tpu.utils import metrics

    _, rows = io.load_dump(GOLDEN)
    cfg = PRESETS["bh_legacy"].replace(use_pallas=False, check_overflow=False)
    assert cfg.n == rows.shape[0] == 10_000
    sim = Simulation(cfg, method="barnes_hut")
    st0 = sim.init_state()
    st = sim.run_scan(st0, 100)
    pos = np.asarray(st.pos)
    vel = np.asarray(st.vel)

    r_ours = np.linalg.norm(pos[:, :2], axis=1)
    r_gold = np.linalg.norm(rows[:, :2], axis=1)
    v_ours = np.linalg.norm(vel[:, :2], axis=1)
    v_gold = np.linalg.norm(rows[:, 3:5], axis=1)

    assert _ks_distance(r_ours, r_gold) < 0.035
    assert _ks_distance(v_ours, v_gold) < 0.045
    assert abs(np.median(r_ours) / np.median(r_gold) - 1.0) < 0.05
    assert abs(np.median(v_ours) / np.median(v_gold) - 1.0) < 0.05

    # conservation over the same 100 steps (the golden has no energy
    # record, but ours must not drift: measured ~0.0000)
    e0 = float(metrics.total_energy(st0, cfg))
    e1 = float(metrics.total_energy(st, cfg))
    assert metrics.energy_drift(e0, e1) < 5e-3
    # momentum conservation: the IC carries nonzero net momentum (random
    # draws), so p(t) must stay near p(0), measured vs the total momentum
    # scale
    p0 = np.asarray(metrics.momentum(st0))
    p1 = np.asarray(metrics.momentum(st))
    p_scale = float(np.sum(np.asarray(st.mass)
                           * np.linalg.norm(np.asarray(st.vel), axis=1)))
    assert np.linalg.norm(p1 - p0) < 5e-3 * p_scale


def test_checkpoint_roundtrip(tmp_path):
    st = disk_galaxy_msvc(64, 42, 0.5)
    path = str(tmp_path / "ck.npz")
    io.save_checkpoint(path, st, step=13)
    st2, step = io.load_checkpoint(path)
    assert step == 13
    np.testing.assert_array_equal(np.asarray(st.pos), np.asarray(st2.pos))
    np.testing.assert_array_equal(np.asarray(st.mass), np.asarray(st2.mass))


def test_native_runtime_if_built(tmp_path):
    try:
        from nbody_tpu.native import runtime
    except Exception:
        pytest.skip("native module missing")
    if not runtime.available():
        pytest.skip("native lib not built")
    a = runtime.msvc_rand(42, 100)
    np.testing.assert_array_equal(a, msvc_rand_sequence(42, 100))
    data = np.arange(12, dtype=np.float64).reshape(4, 3) / 7.0
    p = str(tmp_path / "nat.txt")
    runtime.write_dump(p, "# hdr", data)
    back = runtime.load_dump(p, 10, 3)
    np.testing.assert_allclose(back, np.round(data, 6), atol=1e-9)
