"""Force correctness: O(N^2) oracle, theta->0 convergence, tiled-vs-
reference traversal, Pallas-vs-jnp equivalence."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from nbody_tpu.config import SimConfig
from nbody_tpu.ops import bbox, morton, forces
from nbody_tpu.ops.tree import build_tree
from nbody_tpu.models.simulation import compute_bh_acc


def _cloud(n, seed=0):
    rng = np.random.default_rng(seed)
    pos = rng.uniform(-1000, 1000, (n, 3)).astype(np.float32)
    mass = rng.uniform(1.0, 5.0, n).astype(np.float32)
    return jnp.asarray(pos), jnp.asarray(mass)


def _numpy_direct(pos, mass, g, soft):
    p = np.asarray(pos, np.float64)
    m = np.asarray(mass, np.float64)
    d = p[None, :, :] - p[:, None, :]
    d2 = (d**2).sum(-1) + soft
    inv3 = d2**-1.5
    w = g * m[None, :] * inv3
    np.fill_diagonal(w, 0.0)  # self term has d=0 anyway
    return (w[:, :, None] * d).sum(1)


def _sorted_tree(pos, mass, cfg):
    lo, size = bbox.bounding_cube(pos)
    codes = morton.encode30(pos, lo, size)
    sc, perm = morton.morton_sort_30(codes)
    pos_s, mass_s = pos[perm], mass[perm]
    return build_tree(sc, pos_s, mass_s, size), pos_s, mass_s, perm


def test_direct_vs_numpy():
    cfg = SimConfig(n=512)
    pos, mass = _cloud(512)
    acc = np.asarray(forces.direct_forces(pos, mass, cfg))
    want = _numpy_direct(pos, mass, cfg.g, cfg.softening)
    np.testing.assert_allclose(acc, want, rtol=2e-4, atol=2e-5)


def test_direct_blocked_matches_unblocked():
    cfg = SimConfig(n=1500)
    pos, mass = _cloud(1500, seed=1)
    a1 = forces.direct_forces(pos, mass, cfg, block=256)
    a2 = forces.direct_forces(pos, mass, cfg, block=4096)
    np.testing.assert_allclose(np.asarray(a1), np.asarray(a2), rtol=1e-5, atol=1e-6)


def test_bh_theta_zero_equals_direct():
    """With theta -> 0 every internal node is opened, so the walk reduces to
    a leaf enumeration == all-pairs sum."""
    n = 700
    cfg = SimConfig(n=n, theta=1e-7)
    pos, mass = _cloud(n, seed=2)
    tree, pos_s, mass_s, perm = _sorted_tree(pos, mass, cfg)
    acc_bh = np.asarray(forces.bh_forces_reference(pos_s, tree, cfg))
    acc_dir = np.asarray(forces.direct_forces(pos_s, mass_s, cfg))
    np.testing.assert_allclose(acc_bh, acc_dir, rtol=5e-4, atol=1e-5)


@pytest.mark.parametrize("theta,tol", [(0.3, 0.01), (0.5, 0.03)])
def test_bh_accuracy_vs_direct(theta, tol):
    n = 2048
    cfg = SimConfig(n=n, theta=theta)
    pos, mass = _cloud(n, seed=3)
    tree, pos_s, mass_s, _ = _sorted_tree(pos, mass, cfg)
    acc_bh = np.asarray(forces.bh_forces_reference(pos_s, tree, cfg))
    acc_dir = np.asarray(forces.direct_forces(pos_s, mass_s, cfg))
    num = np.linalg.norm(acc_bh - acc_dir, axis=1)
    den = np.linalg.norm(acc_dir, axis=1) + 1e-12
    assert np.median(num / den) < tol


def _sorted_grouped(pos, mass, cfg):
    from nbody_tpu.ops import bbox as _bbox, morton as _morton

    lo, size = _bbox.bounding_cube(pos)
    codes = _morton.encode30(pos, lo, size)
    sc, perm = _morton.morton_sort_30(codes)
    pos_s, mass_s = pos[perm], mass[perm]
    return forces.pad_to_groups(pos_s, mass_s, cfg.force_tile)


def _bands(pos_s, mass_s, cfg):
    b = cfg.force_tile
    gi = forces.make_group_info(pos_s, mass_s, b, cfg.g)
    subs = forces.make_group_info(pos_s, mass_s, b // forces.SUB_FACTOR, cfg.g)
    g = gi.com.shape[0]
    sdm = np.asarray(subs.diam).reshape(g, forces.SUB_FACTOR).max(1)
    bands = forces.band_lists(gi, jnp.asarray(sdm), cfg, tgt_subs=subs)
    return gi, subs, sdm, bands


def test_group_info_spheres_and_monopoles():
    n = 2048
    cfg = SimConfig(n=n, theta=0.5, force_tile=256, use_pallas=False)
    pos, mass = _cloud(n, seed=4)
    pos_s, mass_s = _sorted_grouped(pos, mass, cfg)
    gi = forces.make_group_info(pos_s, mass_s, 256, cfg.g)
    g = n // 256
    ps = np.asarray(pos_s).reshape(g, 256, 3)
    ms = np.asarray(mass_s).reshape(g, 256)
    np.testing.assert_allclose(np.asarray(gi.gmass), cfg.g * ms.sum(1), rtol=1e-5)
    want_com = (ps * ms[..., None]).sum(1) / ms.sum(1)[:, None]
    np.testing.assert_allclose(np.asarray(gi.com), want_com, rtol=1e-4, atol=1e-2)
    # spheres contain their particles
    d = np.linalg.norm(ps - np.asarray(gi.center)[:, None, :], axis=-1)
    assert np.all(d.max(1) <= np.asarray(gi.radius) * (1 + 1e-5) + 1e-4)
    # MAC size is the max bbox extent (v5 cell-width semantics)
    ext = ps.max(1) - ps.min(1)
    np.testing.assert_allclose(np.asarray(gi.diam), ext.max(-1), rtol=1e-6)


def test_band_lists_partition_against_numpy():
    """Recompute the band classification in numpy and check the compacted
    lists match: far/mid/near partition every source for every target."""
    n = 2048
    cfg = SimConfig(n=n, theta=0.5, force_tile=256, use_pallas=False)
    pos, mass = _cloud(n, seed=5)
    pos_s, mass_s = _sorted_grouped(pos, mass, cfg)
    gi, subs, sdm, bands = _bands(pos_s, mass_s, cfg)
    g = gi.com.shape[0]
    com = np.asarray(gi.com)
    s = forces.SUB_FACTOR
    ctr = np.asarray(subs.center).reshape(g, s, 3)
    rad = np.asarray(subs.radius).reshape(g, s)
    diam = np.asarray(gi.diam)
    soft = forces.soft_term(cfg)

    mid_np = np.asarray(bands.mid_idx)
    near_np = np.asarray(bands.near_idx)
    mc, nc = np.asarray(bands.mid_cnt), np.asarray(bands.near_cnt)
    assert not bool(bands.mid_overflow) and not bool(bands.near_overflow)
    for t in range(g):
        gap_s = np.maximum(
            np.linalg.norm(com[:, None, :] - ctr[t][None, :, :], axis=-1)
            - rad[t][None, :], 0.0,
        )
        gap = gap_s.min(axis=1)
        dist = np.sqrt(gap * gap + soft)
        fail0 = diam / dist >= cfg.theta
        sub_ok = sdm / dist < cfg.theta
        want_mid = set(np.nonzero(fail0 & sub_ok)[0])
        want_near = set(np.nonzero(fail0 & ~sub_ok)[0])
        assert set(mid_np[t, : mc[t]]) == want_mid
        assert set(near_np[t, : nc[t]]) == want_near
        assert np.all(mid_np[t, mc[t]:] == g)
        assert np.all(near_np[t, nc[t]:] == g)


def test_mid_tables_telescoping():
    """A mid pair's 9 table rows must sum (in mass) to zero net-added mass
    beyond the 8 sub monopoles: subs' gmass - parent gmass == 0."""
    n = 2048
    cfg = SimConfig(n=n, theta=0.5, force_tile=256, use_pallas=False)
    pos, mass = _cloud(n, seed=5)
    pos_s, mass_s = _sorted_grouped(pos, mass, cfg)
    gi, subs, sdm, bands = _bands(pos_s, mass_s, cfg)
    tab = np.asarray(forces.build_mid_tables(gi, subs, bands.mid_idx, bands.near_idx))
    g = gi.com.shape[0]
    mc = np.asarray(bands.mid_cnt)
    nc = np.asarray(bands.near_cnt)
    mid_cols = cfg.mid_cap * 9
    near_part = tab[:, mid_cols:, :]
    tab9 = tab[:, :mid_cols, :].reshape(g, -1, 9, 4)
    # near anti-parent rows carry negative mass for real entries
    for t in range(min(g, 4)):
        assert np.all(near_part[t, : nc[t], 3] <= 0.0)
        assert np.all(near_part[t, nc[t]:, :] == 0.0)
    for t in range(min(g, 4)):
        for k in range(mc[t]):
            assert abs(tab9[t, k, :, 3].sum()) < 1e-2   # subs - parent ~ 0
        # padding rows are all zero
        assert np.all(tab9[t, mc[t]:] == 0.0)


def test_grouped_matches_direct_within_theta_error():
    """Every far group satisfies the conservative MAC, every near group is
    exact -> error vs direct must be bounded by the theta tolerance and be
    no worse than the per-particle reference walk."""
    n = 2048
    cfg = SimConfig(n=n, theta=0.5, force_tile=256, use_pallas=False)
    pos, mass = _cloud(n, seed=4)
    tree, pos_s, mass_s, _ = _sorted_tree(pos, mass, cfg)
    acc_ref = np.asarray(forces.bh_forces_reference(pos_s, tree, cfg))
    acc_grp = np.asarray(forces.bh_forces_grouped(pos_s, mass_s, cfg))
    acc_dir = np.asarray(forces.direct_forces(pos_s, mass_s, cfg))
    err_ref = np.linalg.norm(acc_ref - acc_dir, axis=1).mean()
    err_grp = np.linalg.norm(acc_grp - acc_dir, axis=1).mean()
    assert err_grp <= err_ref * 1.05 + 1e-8
    den = np.linalg.norm(acc_dir, axis=1) + 1e-12
    assert np.median(np.linalg.norm(acc_grp - acc_dir, axis=1) / den) < 0.02


def test_band_sum_equals_full_decomposition():
    """far + mid + near must equal bh_forces_grouped exactly."""
    n = 1024
    cfg = SimConfig(n=n, theta=0.5, force_tile=128, use_pallas=False)
    pos, mass = _cloud(n, seed=6)
    pos_s, mass_s = _sorted_grouped(pos, mass, cfg)
    gi, subs, sdm, bands = _bands(pos_s, mass_s, cfg)
    tab = forces.build_mid_tables(gi, subs, bands.mid_idx, bands.near_idx)
    far = np.asarray(forces.far_sweep_jnp(pos_s, gi, cfg))
    mid = np.asarray(forces.table_sweep_jnp(pos_s, tab, cfg))
    corr = np.asarray(
        forces.near_correction_jnp(pos_s, pos_s, mass_s, gi, bands.near_idx, cfg)
    )
    total = np.asarray(forces.bh_forces_grouped(pos_s, mass_s, cfg))
    np.testing.assert_allclose(far + mid + corr, total, rtol=1e-5, atol=1e-5)


def test_pallas_matches_jnp_far_mid_near():
    n = 1024
    cfg = SimConfig(n=n, theta=0.5, force_tile=128, use_pallas=False)
    pos, mass = _cloud(n, seed=6)
    pos_s, mass_s = _sorted_grouped(pos, mass, cfg)
    gi, subs, sdm, bands = _bands(pos_s, mass_s, cfg)
    tab = forces.build_mid_tables(gi, subs, bands.mid_idx, bands.near_idx)

    from nbody_tpu.ops.pallas.forces import (
        far_sweep_pallas, table_sweep_pallas, near_correction_pallas,
    )

    f_jnp = forces.far_sweep_jnp(pos_s, gi, cfg)
    f_pal = far_sweep_pallas(pos_s, gi, cfg)
    np.testing.assert_allclose(np.asarray(f_pal), np.asarray(f_jnp), rtol=2e-5, atol=2e-4)

    m_jnp = forces.table_sweep_jnp(pos_s, tab, cfg)
    m_pal = table_sweep_pallas(pos_s, tab, cfg)
    np.testing.assert_allclose(np.asarray(m_pal), np.asarray(m_jnp), rtol=2e-5, atol=2e-4)

    c_jnp = forces.near_correction_jnp(pos_s, pos_s, mass_s, gi, bands.near_idx, cfg)
    c_pal = near_correction_pallas(
        pos_s, pos_s, mass_s, gi, bands.near_idx, bands.near_cnt, cfg
    )
    np.testing.assert_allclose(np.asarray(c_pal), np.asarray(c_jnp), rtol=2e-5, atol=2e-4)


def test_pad_to_groups_massless():
    n = 1000
    cfg = SimConfig(n=n, force_tile=256, use_pallas=False)
    pos, mass = _cloud(n, seed=7)
    pos_p, mass_p = forces.pad_to_groups(pos, mass, 256)
    assert pos_p.shape[0] == 1024
    assert float(jnp.sum(mass_p[n:])) == 0.0
    # padded bodies change nothing for real bodies
    acc_pad = np.asarray(forces.bh_forces_grouped(pos_p, mass_p, cfg))[:n]
    # direct forces on the unpadded set
    acc_dir = np.asarray(forces.direct_forces(pos, mass, cfg))
    den = np.linalg.norm(acc_dir, axis=1) + 1e-12
    assert np.median(np.linalg.norm(acc_pad - acc_dir, axis=1) / den) < 0.02


def test_compute_bh_acc_original_order_and_padding():
    # n NOT a multiple of force_tile: exercises the padding path; result
    # must be independent of input ordering (scatter-back check).
    n = 1000
    cfg = SimConfig(n=n, theta=0.4, force_tile=256, use_pallas=False)
    pos, mass = _cloud(n, seed=7)
    acc = np.asarray(compute_bh_acc(pos, mass, cfg))
    rng = np.random.default_rng(0)
    perm = rng.permutation(n)
    acc_p = np.asarray(compute_bh_acc(pos[perm], mass[perm], cfg))
    np.testing.assert_allclose(acc_p, acc[perm], rtol=1e-4, atol=1e-4)


def test_legacy_softening_changes_law():
    n = 256
    cfg_v5 = SimConfig(n=n)
    cfg_leg = SimConfig(n=n, legacy_softening=True)
    pos, mass = _cloud(n, seed=8)
    a_v5 = np.asarray(forces.direct_forces(pos, mass, cfg_v5))
    a_leg = np.asarray(forces.direct_forces(pos, mass, cfg_leg))
    # soft = 50 vs 2500 -> materially different near-field
    assert not np.allclose(a_v5, a_leg, rtol=1e-3)
    want = _numpy_direct(pos, mass, cfg_leg.g, cfg_leg.softening**2)
    np.testing.assert_allclose(a_leg, want, rtol=2e-4, atol=2e-5)
