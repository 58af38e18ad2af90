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
    return forces.pad_sorted(pos_s, mass_s, sc, cfg.force_tile)


def _hierarchy(pos_s, mass_s, codes_s, cfg):
    cells, supers, bands, _ = forces.build_bands(pos_s, mass_s, codes_s, cfg)
    tgt_subs = forces.target_subspheres(pos_s, cfg.force_tile)
    return cells, supers, tgt_subs, bands


def test_supers_aggregate_cells():
    n = 2048
    cfg = SimConfig(n=n, theta=0.5, force_tile=128, use_pallas=False,
                    sup_cap=64, mid_cap=512, near_cap=256)
    pos, mass = _cloud(n, seed=4)
    pos_s, mass_s, codes_s = _sorted_grouped(pos, mass, cfg)
    cells, supers, tgt_subs, bands = _hierarchy(pos_s, mass_s, codes_s, cfg)
    gm = np.asarray(cells.gmass)
    sm = np.asarray(supers.gmass)
    np.testing.assert_allclose(sm, gm.reshape(-1, 8).sum(1), rtol=1e-5)
    np.testing.assert_allclose(sm.sum(), cfg.g * np.asarray(mass_s).sum(), rtol=1e-4)
    # super com is the mass-weighted mean of member-cell coms
    com = np.asarray(cells.com).reshape(-1, 8, 3)
    want = (com * gm.reshape(-1, 8)[..., None]).sum(1) / np.maximum(
        gm.reshape(-1, 8).sum(1), 1e-20
    )[:, None]
    ok = sm > 0
    np.testing.assert_allclose(np.asarray(supers.com)[ok], want[ok], rtol=1e-3, atol=1e-2)


def test_cell_band_partition_against_numpy():
    """Recompute the two-stage classification in numpy: every (target,
    cell) pair is far / mid / near consistently with the compacted lists,
    and every approximated cell satisfies width/dist < theta."""
    n = 2048
    cfg = SimConfig(n=n, theta=0.5, force_tile=128, use_pallas=False,
                    sup_cap=64, mid_cap=512, near_cap=256)
    pos, mass = _cloud(n, seed=5)
    pos_s, mass_s, codes_s = _sorted_grouped(pos, mass, cfg)
    cells, supers, tgt_subs, bands = _hierarchy(pos_s, mass_s, codes_s, cfg)
    assert not bool(bands.sup_overflow)
    assert not bool(bands.mid_overflow)
    assert not bool(bands.near_overflow)

    t = pos_s.shape[0] // cfg.force_tile
    s = forces.SUB_FACTOR
    ctr = np.asarray(tgt_subs.center).reshape(t, s, 3)
    rad = np.asarray(tgt_subs.radius).reshape(t, s)
    soft = forces.soft_term(cfg)
    th = cfg.theta

    sup_com = np.asarray(supers.com)
    sup_diam = np.asarray(supers.diam)
    c_com = np.asarray(cells.com)
    c_diam = np.asarray(cells.diam)
    c_cdm = np.asarray(cells.child_diam_max)
    g_cap = c_com.shape[0]

    def min_gap(coms, tc, tr):
        gap = np.linalg.norm(coms[:, None, :] - tc[None, :, :], axis=-1) - tr[None, :]
        return np.maximum(gap.min(axis=1), 0.0)

    si, sc = np.asarray(bands.sup_idx), np.asarray(bands.sup_cnt)
    mi, mc = np.asarray(bands.mid_idx), np.asarray(bands.mid_cnt)
    ni, nc = np.asarray(bands.near_idx), np.asarray(bands.near_cnt)
    for ti in range(t):
        dist2 = np.sqrt(min_gap(sup_com, ctr[ti], rad[ti]) ** 2 + soft)
        fail2 = sup_diam / dist2 >= th
        assert set(si[ti, : sc[ti]]) == set(np.nonzero(fail2)[0])
        # candidate cells of failing supers
        cand = sorted(
            c for H in np.nonzero(fail2)[0] for c in range(8 * H, 8 * H + 8)
        )
        cand = [c for c in cand if c < g_cap]
        distc = np.sqrt(min_gap(c_com[cand], ctr[ti], rad[ti]) ** 2 + soft)
        failc = c_diam[cand] / distc >= th
        # child test: conservative gap to the child-COM bounding box
        kid_ok = np.asarray(cells.child_gmass) > 0
        ccom = np.asarray(cells.child_com)
        big = 3.0e38
        blo = np.where(kid_ok[..., None], ccom, big).min(axis=1)[cand]
        bhi = np.where(kid_ok[..., None], ccom, -big).max(axis=1)[cand]
        cl = np.clip(ctr[ti][None, :, :], blo[:, None, :], bhi[:, None, :])
        gapb = np.linalg.norm(cl - ctr[ti][None, :, :], axis=-1) - rad[ti][None, :]
        gapb = np.maximum(gapb.min(axis=1), 0.0)
        distb = np.sqrt(gapb * gapb + soft)
        midm = failc & (c_cdm[cand] / distb < th)
        nearm = failc & ~midm
        want_mid = {cand[k] for k in np.nonzero(midm)[0]}
        want_near = {cand[k] for k in np.nonzero(nearm)[0]}
        assert set(mi[ti, : mc[ti]]) == want_mid
        assert set(ni[ti, : nc[ti]]) == want_near


def test_cell_tables_telescoping():
    """Sum of table masses per target == 0 net beyond refinement: each
    failing super's 8 cells minus itself, each mid cell's children minus
    itself, each near cell minus itself."""
    n = 2048
    cfg = SimConfig(n=n, theta=0.5, force_tile=128, use_pallas=False,
                    sup_cap=64, mid_cap=512, near_cap=256)
    pos, mass = _cloud(n, seed=5)
    pos_s, mass_s, codes_s = _sorted_grouped(pos, mass, cfg)
    cells, supers, tgt_subs, bands = _hierarchy(pos_s, mass_s, codes_s, cfg)
    tab = np.asarray(forces.build_cell_tables(cells, supers, bands))
    nc = np.asarray(bands.near_cnt)
    ni = np.asarray(bands.near_idx)
    gm = np.asarray(cells.gmass)
    a_cols = cfg.sup_cap * 9
    b_cols = cfg.mid_cap * 9
    for ti in range(min(tab.shape[0], 4)):
        # A rows: 8 cells - super => net 0; B rows: children - cell => 0
        np.testing.assert_allclose(tab[ti, :a_cols, 3].sum(), 0.0, atol=2e-2)
        np.testing.assert_allclose(
            tab[ti, a_cols:a_cols + b_cols, 3].sum(), 0.0, atol=2e-2
        )
        # N rows: minus each near cell's mass
        want = -gm[ni[ti, : nc[ti]]].sum()
        np.testing.assert_allclose(
            tab[ti, a_cols + b_cols:, 3].sum(), want, rtol=1e-4, atol=1e-3
        )


def test_grouped_matches_direct_within_theta_error():
    """Every approximated cell satisfies the conservative MAC, every near
    cell is exact -> error vs direct must be bounded by the theta
    tolerance and no worse than the per-particle reference walk."""
    n = 2048
    cfg = SimConfig(n=n, theta=0.5, force_tile=256, use_pallas=False,
                    sup_cap=32, mid_cap=256, near_cap=128)
    pos, mass = _cloud(n, seed=4)
    tree, pos_s, mass_s, _ = _sorted_tree(pos, mass, cfg)
    acc_ref = np.asarray(forces.bh_forces_reference(pos_s, tree, cfg))
    pos_p, mass_p, codes_p = _sorted_grouped(pos, mass, cfg)
    acc_grp = np.asarray(forces.bh_forces_grouped(pos_p, mass_p, codes_p, cfg))[:n]
    acc_dir = np.asarray(forces.direct_forces(pos_s, mass_s, cfg))
    err_ref = np.linalg.norm(acc_ref - acc_dir, axis=1).mean()
    err_grp = np.linalg.norm(acc_grp - acc_dir, axis=1).mean()
    assert err_grp <= err_ref * 1.05 + 1e-8
    den = np.linalg.norm(acc_dir, axis=1) + 1e-12
    assert np.median(np.linalg.norm(acc_grp - acc_dir, axis=1) / den) < 0.02


def test_band_sum_equals_full_decomposition():
    """far + mid + near must equal bh_forces_grouped exactly."""
    n = 1024
    cfg = SimConfig(n=n, theta=0.5, force_tile=128, use_pallas=False,
                    sup_cap=64, mid_cap=512, near_cap=256)
    pos, mass = _cloud(n, seed=6)
    pos_s, mass_s, codes_s = _sorted_grouped(pos, mass, cfg)
    cells, supers, tgt_subs, bands = _hierarchy(pos_s, mass_s, codes_s, cfg)
    tab = forces.build_cell_tables(cells, supers, bands)
    far = np.asarray(forces.far_sweep_jnp(pos_s, supers, cfg))
    mid = np.asarray(forces.table_sweep_jnp(pos_s, tab, cfg))
    corr = np.asarray(
        forces.near_correction_jnp(pos_s, pos_s, mass_s, cells, bands.near_idx, cfg)
    )
    total = np.asarray(forces.bh_forces_grouped(pos_s, mass_s, codes_s, cfg))
    np.testing.assert_allclose(far + mid + corr, total, rtol=1e-5, atol=1e-5)


def test_pallas_matches_jnp_far_mid_near():
    n = 1024
    cfg = SimConfig(n=n, theta=0.5, force_tile=128, use_pallas=False,
                    sup_cap=64, mid_cap=512, near_cap=256)
    pos, mass = _cloud(n, seed=6)
    pos_s, mass_s, codes_s = _sorted_grouped(pos, mass, cfg)
    cells, supers, tgt_subs, bands = _hierarchy(pos_s, mass_s, codes_s, cfg)
    tab = forces.build_cell_tables(cells, supers, bands)

    from nbody_tpu.ops.pallas.forces import (
        far_sweep_pallas, table_sweep_pallas, near_correction_pallas,
    )

    f_jnp = forces.far_sweep_jnp(pos_s, supers, cfg)
    f_pal = far_sweep_pallas(pos_s, supers, cfg)
    np.testing.assert_allclose(np.asarray(f_pal), np.asarray(f_jnp), rtol=2e-5, atol=2e-4)

    m_jnp = forces.table_sweep_jnp(pos_s, tab, cfg)
    m_pal = table_sweep_pallas(pos_s, tab, cfg)
    np.testing.assert_allclose(np.asarray(m_pal), np.asarray(m_jnp), rtol=2e-5, atol=2e-4)

    c_jnp = forces.near_correction_jnp(pos_s, pos_s, mass_s, cells, bands.near_idx, cfg)
    c_pal = near_correction_pallas(
        pos_s, pos_s, mass_s, cells, bands.near_idx, bands.near_cnt, cfg
    )
    np.testing.assert_allclose(np.asarray(c_pal), np.asarray(c_jnp), rtol=2e-5, atol=2e-4)


def test_pad_to_groups_massless():
    n = 1000
    cfg = SimConfig(n=n, force_tile=256, use_pallas=False,
                    sup_cap=16, mid_cap=128, near_cap=64)
    pos, mass = _cloud(n, seed=7)
    pos_p, mass_p, codes_p = _sorted_grouped(pos, mass, cfg)
    assert pos_p.shape[0] == 1024
    assert float(jnp.sum(mass_p[n:])) == 0.0
    # padded bodies change nothing for real bodies
    acc_pad = np.asarray(forces.bh_forces_grouped(pos_p, mass_p, codes_p, cfg))[:n]
    acc_dir = np.asarray(forces.direct_forces(pos_p[:n], mass_p[:n], cfg))
    den = np.linalg.norm(acc_dir, axis=1) + 1e-12
    assert np.median(np.linalg.norm(acc_pad - acc_dir, axis=1) / den) < 0.02
