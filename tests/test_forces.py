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
    """(cells, far, tgt_subs, bands) where `far` is the far-sweep level
    (super-supers — the build_bands contract)."""
    cells, far, bands, _ = forces.build_bands(pos_s, mass_s, codes_s, cfg)
    tgt_subs = forces.target_subspheres(pos_s, cfg.force_tile, codes=codes_s)
    return cells, far, tgt_subs, bands


def test_supers_aggregate_cells():
    n = 2048
    cfg = SimConfig(n=n, theta=0.5, force_tile=128, use_pallas=False,
                    sup_cap=64, mid_cap=512, near_cap=256)
    pos, mass = _cloud(n, seed=4)
    pos_s, mass_s, codes_s = _sorted_grouped(pos, mass, cfg)
    cells, _, _, _ = _hierarchy(pos_s, mass_s, codes_s, cfg)
    supers = forces.make_supers(cells)
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


def test_supersupers_aggregate_supers():
    """Level-3 aggregates: gmass sums member supers, com is the mass-
    weighted member mean, diam bounds every member bbox, skin is the
    member max — the invariants the stage-0 MAC relies on."""
    n = 4096
    cfg = SimConfig(n=n, theta=0.5, force_tile=64, use_pallas=False)
    pos, mass = _cloud(n, seed=7)
    pos_s, mass_s, codes_s = _sorted_grouped(pos, mass, cfg)
    cells, ssf, _, _ = _hierarchy(pos_s, mass_s, codes_s, cfg)
    supers = forces.make_supers(cells)
    ss = forces.make_supersupers(supers)
    # the far level returned by build_bands IS the super-super level
    np.testing.assert_array_equal(np.asarray(ssf.gmass), np.asarray(ss.gmass))
    sm = np.asarray(supers.gmass)
    gm = np.asarray(ss.gmass)
    np.testing.assert_allclose(gm, sm.reshape(-1, 8).sum(1), rtol=1e-5)
    np.testing.assert_allclose(gm.sum(), cfg.g * np.asarray(mass_s).sum(),
                               rtol=1e-4)
    com = np.asarray(supers.com).reshape(-1, 8, 3)
    want = (com * sm.reshape(-1, 8)[..., None]).sum(1) / np.maximum(
        sm.reshape(-1, 8).sum(1), 1e-20
    )[:, None]
    ok = gm > 0
    np.testing.assert_allclose(np.asarray(ss.com)[ok], want[ok],
                               rtol=1e-3, atol=1e-2)
    # diam covers the union of member bboxes; skin is the member max
    lo = np.asarray(supers.lo).reshape(-1, 8, 3)
    hi = np.asarray(supers.hi).reshape(-1, 8, 3)
    live = sm.reshape(-1, 8) > 0
    for i in np.nonzero(ok)[0]:
        ext = hi[i][live[i]].max(0) - lo[i][live[i]].min(0)
        assert np.asarray(ss.diam)[i] >= ext.max() - 1e-4
    np.testing.assert_allclose(
        np.asarray(ss.skin),
        np.asarray(supers.skin).reshape(-1, 8).max(1), rtol=1e-6)
    assert int(ss.n_supers) == -(-int(supers.n_supers) // 8)


@pytest.mark.parametrize("skin", [0.0, 25.0])
def test_cell_band_partition_against_numpy(skin):
    """Recompute the three-stage classification in numpy: every (target,
    source) pair lands in far / mid / cmid / near consistently with the
    compacted lists, every approximated region satisfies the
    (skin-inflated) MAC, and the merged exact spans cover exactly the
    union of the near children's particles."""
    n = 2048
    cfg = SimConfig(n=n, theta=0.5, force_tile=128, use_pallas=False,
                    sup_cap=64, mid_cap=512, cmid_cap=1024, near_cap=1024)
    pos, mass = _cloud(n, seed=5)
    pos_s, mass_s, codes_s = _sorted_grouped(pos, mass, cfg)
    cells, ss, bands, _ = forces.build_bands(
        pos_s, mass_s, codes_s, cfg, skin=skin
    )
    supers = forces.make_supers(cells)
    tgt_subs = forces.target_subspheres(pos_s, cfg.force_tile, codes=codes_s)
    assert not bool(bands.ss_overflow)
    assert not bool(bands.sup_overflow)
    assert not bool(bands.mid_overflow)
    assert not bool(bands.cmid_overflow)
    assert not bool(bands.near_overflow)

    t = pos_s.shape[0] // cfg.force_tile
    s = forces.SUB_FACTOR
    ctr = np.asarray(tgt_subs.center).reshape(t, s, 3)
    rad = np.asarray(tgt_subs.radius).reshape(t, s)
    soft = forces.soft_term(cfg)
    th = cfg.theta

    ss_com = np.asarray(ss.com)
    ss_diam = np.asarray(ss.diam)
    ss_gm = np.asarray(ss.gmass)
    sup_com = np.asarray(supers.com)
    sup_diam = np.asarray(supers.diam)
    sup_gm = np.asarray(supers.gmass)
    c_com = np.asarray(cells.com)
    c_diam = np.asarray(cells.diam)
    k_com = np.asarray(cells.child_com)        # [Gc, 8, 3]
    k_diam = np.asarray(cells.child_diam)
    k_gm = np.asarray(cells.child_gmass)
    k_first = np.asarray(cells.child_first)
    k_count = np.asarray(cells.child_count)
    gdm = np.asarray(cells.gchild_diam_max)    # [Gc, 8]
    gc_gm = np.asarray(cells.gchild_gmass)     # [Gc, 8, 8]
    gc_com = np.asarray(cells.gchild_com)
    g_cap = c_com.shape[0]

    def min_gap(coms, tc, tr):
        gap = np.linalg.norm(coms[:, None, :] - tc[None, :, :], axis=-1) - tr[None, :]
        return np.maximum(np.maximum(gap.min(axis=1), 0.0) - skin, 0.0)

    ssi, ssc = np.asarray(bands.ss_idx), np.asarray(bands.ss_cnt)
    si, sc = np.asarray(bands.sup_idx), np.asarray(bands.sup_cnt)
    mi, mc = np.asarray(bands.mid_idx), np.asarray(bands.mid_cnt)
    ci, cc = np.asarray(bands.cmid_idx), np.asarray(bands.cmid_cnt)
    ni, nc = np.asarray(bands.near_idx), np.asarray(bands.near_cnt)
    wf, wm = np.asarray(bands.win_first), np.asarray(bands.win_mask)
    wn = np.asarray(bands.win_cnt)
    for ti in range(t):
        # stage 0: super-supers (only non-empty ones may be listed)
        dist0 = np.sqrt(min_gap(ss_com, ctr[ti], rad[ti]) ** 2 + soft)
        fail0 = ((ss_diam + skin) / dist0 >= th) & (ss_gm > 0)
        assert set(ssi[ti, : ssc[ti]]) == set(np.nonzero(fail0)[0])
        # stage 1: candidate supers of failing super-supers (non-empty)
        cand_s = sorted(
            s for H in np.nonzero(fail0)[0] for s in range(8 * H, 8 * H + 8)
            if s < sup_com.shape[0] and sup_gm[s] > 0
        )
        dist1 = np.sqrt(min_gap(sup_com[cand_s], ctr[ti], rad[ti]) ** 2 + soft)
        fail1 = (sup_diam[cand_s] + skin) / dist1 >= th
        want_sup = {cand_s[k] for k in np.nonzero(fail1)[0]}
        assert set(si[ti, : sc[ti]]) == want_sup
        # stage 2: candidate cells of failing supers
        cand = sorted(
            c for H in sorted(want_sup) for c in range(8 * H, 8 * H + 8)
        )
        cand = [c for c in cand if c < g_cap]
        distc = np.sqrt(min_gap(c_com[cand], ctr[ti], rad[ti]) ** 2 + soft)
        failc = (c_diam[cand] + skin) / distc >= th
        want_mid = {cand[k] for k in np.nonzero(failc)[0]}
        assert set(mi[ti, : mc[ti]]) == want_mid
        # stage 3: children of failing cells
        want_cmid, want_near = set(), set()
        for g in sorted(want_mid):
            for j in range(8):
                if k_gm[g, j] <= 0:
                    continue
                distk = np.sqrt(
                    min_gap(k_com[g, j][None], ctr[ti], rad[ti]) ** 2 + soft
                )[0]
                if (k_diam[g, j] + skin) / distk < th:
                    continue
                # grandchild test: gap to the gc-COM bounding box
                ok = gc_gm[g, j] > 0
                blo = gc_com[g, j][ok].min(axis=0)
                bhi = gc_com[g, j][ok].max(axis=0)
                cl = np.clip(ctr[ti], blo, bhi)
                gapb = np.linalg.norm(cl - ctr[ti], axis=-1) - rad[ti]
                gapb = max(max(gapb.min(), 0.0) - skin, 0.0)
                distb = np.sqrt(gapb * gapb + soft)
                if (gdm[g, j] + skin) / distb < th:
                    want_cmid.add(8 * g + j)
                else:
                    want_near.add(8 * g + j)
        assert set(ci[ti, : cc[ti]]) == want_cmid
        assert set(ni[ti, : nc[ti]]) == want_near
        # masked windows == union of near-child particle indices, each
        # lane exactly once, windows distinct and aligned
        want_pts = set()
        for k in want_near:
            g, j = divmod(k, 8)
            want_pts |= set(range(k_first[g, j], k_first[g, j] + k_count[g, j]))
        got_pts = []
        seen_wins = set()
        for k in range(wn[ti]):
            first = int(wf[ti, k])
            assert first % forces.SPAN_ALIGN == 0   # aligned start
            assert first not in seen_wins           # deduplicated
            seen_wins.add(first)
            any_bit = False
            for w in range(4):
                word = int(wm[ti, w, k]) & 0xFFFFFFFF
                for bit in range(32):
                    if (word >> bit) & 1:
                        got_pts.append(first + 32 * w + bit)
                        any_bit = True
            assert any_bit                          # live window
        assert len(got_pts) == len(set(got_pts))    # disjoint masks
        assert set(got_pts) == want_pts
        assert np.all(wm[ti, :, wn[ti]:] == 0)      # dead tail zeroed


def test_cell_tables_telescoping():
    """Sum of table masses per target == 0 net beyond refinement: each
    failing super's 8 cells minus itself, each failing cell's children
    minus itself, each cmid child's grandchildren minus itself, each near
    child minus itself."""
    n = 2048
    cfg = SimConfig(n=n, theta=0.5, force_tile=128, use_pallas=False,
                    sup_cap=64, mid_cap=512, cmid_cap=1024, near_cap=1024)
    pos, mass = _cloud(n, seed=5)
    pos_s, mass_s, codes_s = _sorted_grouped(pos, mass, cfg)
    cells, ss, tgt_subs, bands = _hierarchy(pos_s, mass_s, codes_s, cfg)
    supers = forces.make_supers(cells)
    tabset = forces.build_cell_tables(cells, supers, ss, bands)
    # reassemble [T, R, 4] from the planar planes for the checks
    tab = np.stack([np.asarray(tabset.tx), np.asarray(tabset.ty),
                    np.asarray(tabset.tz), np.asarray(tabset.tm)], axis=-1)
    rc = np.asarray(tabset.row_cnt)
    nc = np.asarray(bands.near_cnt)
    ni = np.asarray(bands.near_idx)
    kgm = np.asarray(cells.child_gmass).reshape(-1)
    n_cap = cfg.near_cap
    for ti in range(min(tab.shape[0], 4)):
        # near region: minus each near child's mass
        want = -kgm[ni[ti, : nc[ti]]].sum()
        np.testing.assert_allclose(
            tab[ti, :n_cap, 3].sum(), want, rtol=1e-4, atol=1e-3
        )
        # item region: every 9-row item (8 refinements - anti-parent)
        # nets ~0 mass, so the whole region telescopes to 0
        items = tab[ti, n_cap:, 3].reshape(-1, 9)
        np.testing.assert_allclose(items.sum(axis=1), 0.0, atol=2e-2)
        # rows past row_cnt are identically zero (sweep-skip invariant)
        assert rc[ti] == n_cap + 9 * (
            np.asarray(bands.ss_cnt)[ti] + np.asarray(bands.sup_cnt)[ti]
            + np.asarray(bands.mid_cnt)[ti] + np.asarray(bands.cmid_cnt)[ti]
        )
        assert np.all(tab[ti, rc[ti]:, :] == 0.0)


def test_grouped_matches_direct_within_theta_error():
    """Every approximated cell satisfies the conservative MAC, every near
    cell is exact -> error vs direct must be bounded by the theta
    tolerance and no worse than the per-particle reference walk."""
    n = 2048
    cfg = SimConfig(n=n, theta=0.5, force_tile=256, use_pallas=False,
                    sup_cap=32, mid_cap=256, cmid_cap=512, near_cap=512)
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
                    sup_cap=64, mid_cap=512, cmid_cap=1024, near_cap=1024)
    pos, mass = _cloud(n, seed=6)
    pos_s, mass_s, codes_s = _sorted_grouped(pos, mass, cfg)
    cells, ss, tgt_subs, bands = _hierarchy(pos_s, mass_s, codes_s, cfg)
    tab = forces.build_cell_tables(cells, forces.make_supers(cells), ss, bands)
    far = np.asarray(forces.far_sweep_jnp(pos_s, ss, cfg))
    mid = np.asarray(forces.table_sweep_jnp(pos_s, tab, cfg))
    corr = np.asarray(
        forces.near_correction_jnp(
            pos_s, pos_s, mass_s, bands.win_first, bands.win_mask, cfg
        )
    )
    total = np.asarray(forces.bh_forces_grouped(pos_s, mass_s, codes_s, cfg))
    np.testing.assert_allclose(far + mid + corr, total, rtol=1e-5, atol=1e-5)


def test_pallas_matches_jnp_far_mid_near():
    n = 1024
    cfg = SimConfig(n=n, theta=0.5, force_tile=128, use_pallas=False,
                    sup_cap=64, mid_cap=512, cmid_cap=1024, near_cap=1024)
    pos, mass = _cloud(n, seed=6)
    pos_s, mass_s, codes_s = _sorted_grouped(pos, mass, cfg)
    cells, ss, tgt_subs, bands = _hierarchy(pos_s, mass_s, codes_s, cfg)
    tab = forces.build_cell_tables(cells, forces.make_supers(cells), ss, bands)

    from nbody_tpu.ops.pallas.forces import (
        far_sweep_pallas, table_sweep_pallas, near_span_pallas,
    )

    f_jnp = forces.far_sweep_jnp(pos_s, ss, cfg)
    f_pal = far_sweep_pallas(pos_s, ss, cfg)
    np.testing.assert_allclose(np.asarray(f_pal), np.asarray(f_jnp), rtol=2e-5, atol=2e-4)

    m_jnp = forces.table_sweep_jnp(pos_s, tab, cfg)
    m_pal = table_sweep_pallas(pos_s, tab, cfg)
    np.testing.assert_allclose(np.asarray(m_pal), np.asarray(m_jnp), rtol=2e-5, atol=2e-4)

    c_jnp = forces.near_correction_jnp(
        pos_s, pos_s, mass_s, bands.win_first, bands.win_mask, cfg
    )
    c_pal = near_span_pallas(
        pos_s, pos_s, mass_s,
        bands.win_first, bands.win_mask, bands.win_cnt, cfg,
    )
    np.testing.assert_allclose(np.asarray(c_pal), np.asarray(c_jnp), rtol=2e-5, atol=2e-4)


def test_pad_to_groups_massless():
    n = 1000
    cfg = SimConfig(n=n, force_tile=256, use_pallas=False,
                    sup_cap=16, mid_cap=128, cmid_cap=256, near_cap=256)
    pos, mass = _cloud(n, seed=7)
    pos_p, mass_p, codes_p = _sorted_grouped(pos, mass, cfg)
    assert pos_p.shape[0] == 1024
    assert float(jnp.sum(mass_p[n:])) == 0.0
    # padded bodies change nothing for real bodies
    acc_pad = np.asarray(forces.bh_forces_grouped(pos_p, mass_p, codes_p, cfg))[:n]
    acc_dir = np.asarray(forces.direct_forces(pos_p[:n], mass_p[:n], cfg))
    den = np.linalg.norm(acc_dir, axis=1) + 1e-12
    assert np.median(np.linalg.norm(acc_pad - acc_dir, axis=1) / den) < 0.02


def test_g2_cap_overflow_is_graceful():
    """Grandchild-segment cap overflow (g2_cap_factor=1 forces it on a
    clustered cloud) must degrade gracefully: overflowed children are
    routed to exact P2P instead of aliasing another segment's monopoles
    into the cmid band, so accuracy stays at the normal theta level."""
    n = 4096
    rng = np.random.default_rng(11)
    c = rng.uniform(-400, 400, (6, 3))
    pos = jnp.asarray(
        (c[rng.integers(0, 6, n)] + rng.normal(0, 2.0, (n, 3))).astype(np.float32)
    )
    mass = jnp.asarray(rng.uniform(1.0, 5.0, n).astype(np.float32))
    cfg = SimConfig(n=n, theta=0.5, force_tile=256, use_pallas=False,
                    sup_cap=64, mid_cap=256, cmid_cap=512, near_cap=512,
                    g2_cap_factor=1, cell_cap_factor=4)  # overflow scenario
                    # calibrated at factor 4 (c2_cap scales with capacity)
    pos_p, mass_p, codes_p = _sorted_grouped(pos, mass, cfg)
    from nbody_tpu.ops.cells import build_source_cells

    box_lo, box_size = bbox.bounding_cube(pos_p)
    cells = build_source_cells(
        codes_p, pos_p, mass_p, cfg.force_tile, cfg.g, cfg.cell_capacity,
        box_lo, box_size, g2_factor=cfg.g2_cap_factor,
    )
    # the scenario must actually overflow the c2 cap, else this test is
    # vacuous (g2 overflow is the GRACEFUL flag, distinct from the
    # missing-mass cell/child overflow)
    assert bool(cells.overflow_g2)
    assert not bool(cells.overflow)
    assert not bool(np.all(np.asarray(cells.gchild_complete)))

    acc_grp = np.asarray(
        forces.bh_forces_grouped(pos_p, mass_p, codes_p, cfg)
    )[:n]
    # same build without overflow (structural cap g2_factor=8) as the
    # accuracy yardstick: overflow must not degrade beyond the normal
    # theta error of this (pathologically clustered) cloud
    acc_ok = np.asarray(
        forces.bh_forces_grouped(
            pos_p, mass_p, codes_p, cfg.replace(g2_cap_factor=8)
        )
    )[:n]
    # compare in SORTED order against fp64 numpy direct on the same arrays
    acc_dir = _numpy_direct(pos_p[:n], mass_p[:n], cfg.g,
                            forces.soft_term(cfg))
    den = np.linalg.norm(acc_dir, axis=1) + 1e-12
    rel = np.linalg.norm(acc_grp - acc_dir, axis=1) / den
    rel_ok = np.linalg.norm(acc_ok - acc_dir, axis=1) / den
    assert np.median(rel) < np.median(rel_ok) * 1.1 + 1e-6
    assert np.max(rel) < max(np.max(rel_ok) * 1.5, 0.25)


def test_win_cap_overflow_is_graceful():
    """Window-slot cap overflow (tiny win_cap forces it) must drop whole
    trailing near children TOGETHER with their anti-rows: each dropped
    child falls back to its own child monopole — a local theta
    relaxation, never a missing or double-counted force.  Verified by the
    exact bookkeeping invariant: the P2P lane set must equal the union of
    the KEPT near children's particle ranges, for the capped and the
    uncapped build alike."""
    n = 4096
    rng = np.random.default_rng(13)
    c = rng.uniform(-400, 400, (6, 3))
    pos = jnp.asarray(
        (c[rng.integers(0, 6, n)] + rng.normal(0, 2.0, (n, 3))).astype(np.float32)
    )
    mass = jnp.asarray(rng.uniform(1.0, 5.0, n).astype(np.float32))
    base = SimConfig(n=n, theta=0.5, force_tile=256, use_pallas=False,
                     sup_cap=64, mid_cap=512, cmid_cap=1024, near_cap=1024)
    cfg_small = base.replace(win_cap=2)      # force window-slot overflow
    pos_p, mass_p, codes_p = _sorted_grouped(pos, mass, base)

    def lanes_match(cfg, cells, bands):
        """P2P lanes == union of kept near children's particle ranges."""
        cf = np.asarray(cells.child_first).reshape(-1)
        cc_ = np.asarray(cells.child_count).reshape(-1)
        ni = np.asarray(bands.near_idx)
        nc = np.asarray(bands.near_cnt)
        wf = np.asarray(bands.win_first)
        wm = np.asarray(bands.win_mask)
        wc = np.asarray(bands.win_cnt)
        for t in range(ni.shape[0]):
            want = set()
            for cid in ni[t, : nc[t]]:
                want.update(range(cf[cid], cf[cid] + cc_[cid]))
            got = set()
            for k in range(wc[t]):
                for w in range(4):
                    bits = int(wm[t, w, k]) & 0xFFFFFFFF
                    for b_ in range(32):
                        if bits >> b_ & 1:
                            got.add(int(wf[t, k]) + 32 * w + b_)
            assert got == want, (t, len(got), len(want))

    cells_s, _, bands_s, _ = forces.build_bands(pos_p, mass_p, codes_p, cfg_small)
    assert bool(bands_s.near_overflow), "scenario must actually overflow"
    assert int(jnp.max(bands_s.win_cnt)) <= cfg_small.win_cap_eff
    lanes_match(cfg_small, cells_s, bands_s)

    cells_f, _, bands_f, _ = forces.build_bands(pos_p, mass_p, codes_p, base)
    assert not bool(bands_f.near_overflow)
    lanes_match(base, cells_f, bands_f)
    # dropped children shrank the near list (anti-rows truncated with them)
    assert int(jnp.sum(bands_s.near_cnt)) < int(jnp.sum(bands_f.near_cnt))

    # physics stays finite, and a roomy win_cap is a no-op (bit-equal to
    # the structural-maximum cap)
    acc_s = np.asarray(forces.bh_forces_grouped(pos_p, mass_p, codes_p, cfg_small))[:n]
    assert np.isfinite(acc_s).all()
    acc_f = np.asarray(forces.bh_forces_grouped(pos_p, mass_p, codes_p, base))[:n]
    acc_u = np.asarray(forces.bh_forces_grouped(
        pos_p, mass_p, codes_p, base.replace(win_cap=2 * base.near_cap)
    ))[:n]
    np.testing.assert_array_equal(acc_f, acc_u)


def test_window_masks_sliced_matches_dense():
    """The sliced (while_loop) _window_masks must be output-identical to
    the full-width dense reference across adversarial geometries: windows
    straddling slice boundaries, long same-window OR chains, win_cap
    suffix drops, empty rows, and a fully live width."""
    from nbody_tpu.ops.forces import (
        SPAN_ALIGN, _WIN_SLICE_W, _window_masks, _window_masks_dense,
    )

    rng = np.random.default_rng(7)
    cw = _WIN_SLICE_W // 2

    def rand_runs(k, max_gap, max_len, start=0):
        """Ascending disjoint runs with random gaps (gap 0 keeps runs in
        the same window -> OR chains)."""
        firsts, counts = [], []
        cur = start
        for _ in range(k):
            cur += int(rng.integers(0, max_gap + 1))
            c = int(rng.integers(1, max_len + 1))
            firsts.append(cur)
            counts.append(c)
            cur += c
        return firsts, counts

    cases = []
    # dense chains: tiny runs, zero gaps -> many runs per window,
    # chains crossing the slice boundary at child index cw
    f, c = rand_runs(3 * cw, 2, 3)
    cases.append((f, c, 3 * cw, 10**9))
    # straddling runs: long runs crossing SPAN_ALIGN boundaries
    f, c = rand_runs(cw + 5, 200, 2 * SPAN_ALIGN)
    cases.append((f, c, cw + 5, 10**9))
    # win_cap drop: more windows than cap
    f, c = rand_runs(2 * cw, 300, 40)
    cases.append((f, c, 2 * cw, 17))
    # empty row
    cases.append(([], [], 0, 8))
    # exactly one child, one window
    cases.append(([5], [3], 1, 8))
    # full static width live
    f, c = rand_runs(4 * cw, 50, 20)
    cases.append((f, c, 4 * cw, 10**9))

    k_cap = 4 * cw
    for fi, ci, live, cap in cases:
        first = np.zeros((2, k_cap), np.int32)
        count = np.zeros((2, k_cap), np.int32)
        first[0, :live] = fi
        count[0, :live] = ci
        # row 1: a shifted copy with half the children (different trip)
        h = live // 2
        first[1, :h] = np.asarray(fi[:h], np.int32) + 3 * SPAN_ALIGN
        count[1, :h] = ci[:h]
        # pieces must cover the longest run (the production caller sizes
        # it from force_tile: SimConfig.win_pieces)
        pieces = max(2, int(-(-max(ci, default=1) // SPAN_ALIGN)) + 1)
        a = jax.jit(lambda f, c: _window_masks(f, c, cap, pieces=pieces))(
            jnp.asarray(first), jnp.asarray(count))
        b = jax.jit(
            lambda f, c: _window_masks_dense(f, c, cap, pieces=pieces)
        )(jnp.asarray(first), jnp.asarray(count))
        for x, y, name in zip(a, b, ["win_first", "win_mask", "win_cnt",
                                     "kept", "dropped"]):
            np.testing.assert_array_equal(
                np.asarray(x), np.asarray(y), err_msg=f"{name} cap={cap}")


def _windows_oracle(firsts, counts, cap):
    """Brute-force twin of the production window-splitter semantics:
    every run claims its touched windows in ascending rank order; the
    first `cap` DISTINCT windows are emitted; a child whose LAST window
    rank >= cap is dropped (its lane contributions removed everywhere —
    suffix drop), but any window slot its earlier pieces newly opened
    below the cap still appears (zero-masked — matching the splitter,
    whose ranks come from the key sequence before mask zeroing)."""
    from nbody_tpu.ops.forces import SPAN_ALIGN

    order = []                       # distinct windows, rank order
    rank_of = {}
    spans = []                       # (child, windows touched)
    for f, c in zip(firsts, counts):
        if c == 0:
            continue
        touched = list(range(f // SPAN_ALIGN, (f + c - 1) // SPAN_ALIGN + 1))
        for w in touched:
            if w not in rank_of:
                rank_of[w] = len(order)
                order.append(w)
        spans.append((f, c, touched))
    kept = 0
    dropped = False
    wins = {w: np.zeros(128, bool) for w in order[:cap]}
    for f, c, touched in spans:
        if rank_of[touched[-1]] >= cap:
            dropped = True
            continue
        kept += 1
        for w in touched:
            s = max(f, w * SPAN_ALIGN) - w * SPAN_ALIGN
            e = min(f + c, (w + 1) * SPAN_ALIGN) - w * SPAN_ALIGN
            wins[w][s:e] = True
    emit = order[:cap]
    masks = np.zeros((4, len(emit)), np.int32)
    for i, w in enumerate(emit):
        bits = wins[w]
        for m in range(4):
            word = 0
            for b in range(32):
                if bits[32 * m + b]:
                    word |= 1 << b
            masks[m, i] = np.int32(np.uint32(word).astype(np.int32))
    return (np.asarray([w * SPAN_ALIGN for w in emit], np.int32), masks,
            len(emit), kept, dropped)


def test_window_masks_big_children_cover_all_lanes():
    """REGRESSION (round-5 physics bug): a near child is bounded by
    force_tile — NOT force_tile/8 — because the adaptive cut caps CELLS,
    and one octant can hold nearly the whole cell.  A 481-particle child
    at tile 512 touches 5 aligned windows; the old 2-piece splitter
    silently dropped the interior ones (missing mass -> the measured
    theta-independent ~3% halo force error and secular cooling at 1M,
    tools/_prof_fbias*.py).  Checks the sliced production splitter
    against a brute-force lane-coverage oracle, big runs included."""
    from nbody_tpu.ops.forces import SPAN_ALIGN, _window_masks

    rng = np.random.default_rng(11)
    for pieces, max_len in ((3, 2 * SPAN_ALIGN), (5, 4 * SPAN_ALIGN)):
        firsts, counts = [], []
        cur = int(rng.integers(0, 200))
        for _ in range(40):
            cur += int(rng.integers(0, 2 * SPAN_ALIGN))
            c = int(rng.integers(1, max_len + 1))   # many runs > 128
            firsts.append(cur)
            counts.append(c)
            cur += c
        for cap in (10**9, 23):
            k_cap = 64
            first = np.zeros((1, k_cap), np.int32)
            count = np.zeros((1, k_cap), np.int32)
            first[0, :40] = firsts
            count[0, :40] = counts
            wf, wm, wc, kept, dropped = jax.jit(
                lambda f, c: _window_masks(f, c, cap, pieces=pieces)
            )(jnp.asarray(first), jnp.asarray(count))
            owf, owm, own, okept, odrop = _windows_oracle(
                firsts, counts, cap)
            wc0 = int(np.asarray(wc)[0])
            assert wc0 == own
            np.testing.assert_array_equal(np.asarray(wf)[0, :wc0], owf)
            np.testing.assert_array_equal(
                np.asarray(wm)[0, :, :wc0], owm)
            assert int(np.asarray(kept)[0]) == okept
            assert bool(np.asarray(dropped)[0]) == odrop


def test_near_band_window_mass_conservation_tile512():
    """End-to-end reproducer of the round-5 missing-mass bug: at the
    DISK-GALAXY IC (degenerate octants in the dense center) with
    force_tile=512, every target's window-masked lane masses must sum to
    exactly its near children's masses — the telescoping identity the
    anti-child rows rely on."""
    from nbody_tpu.config import PRESETS
    from nbody_tpu.init import make_initial_state
    from nbody_tpu.models.simulation import sort_by_morton

    n = 20_000
    cfg = PRESETS["v5_bench"].replace(n=n, use_pallas=False,
                                      check_overflow=False)
    st = make_initial_state(cfg)
    sc, perm, _, _ = sort_by_morton(st.pos, cfg)
    ps, ms, cs = forces.pad_sorted(st.pos[perm], st.mass[perm], sc,
                                   cfg.force_tile)
    cells, ss, bands, tables = jax.jit(
        lambda p, m, c: forces.build_bands(p, m, c, cfg))(ps, ms, cs)
    mass_np = np.asarray(ms, np.float64)
    child_gm = np.asarray(cells.child_gmass, np.float64).reshape(-1)
    near_idx = np.asarray(bands.near_idx)
    near_cnt = np.asarray(bands.near_cnt)
    wf = np.asarray(bands.win_first)
    wm = np.asarray(bands.win_mask).view(np.uint32)
    wc = np.asarray(bands.win_cnt)
    g = float(cfg.g)
    t_count = wf.shape[0]
    assert np.any(np.asarray(cells.child_count) > 128), \
        "fixture no longer produces >128-particle children"
    for t in range(t_count):
        m_children = child_gm[near_idx[t, :near_cnt[t]]].sum() / g
        m_wins = 0.0
        for w in range(wc[t]):
            lanes = np.zeros(128, bool)
            for word in range(4):
                bits = int(wm[t, word, w])
                for b in range(32):
                    if (bits >> b) & 1:
                        lanes[32 * word + b] = True
            idx = wf[t, w] + np.nonzero(lanes)[0]
            m_wins += mass_np[idx].sum()
        # tolerance separates fp32 child_gmass rounding (measured up to
        # ~1.2e-5 rel on a 481-particle child) from a dropped/extra
        # particle (mass >= 2, >= 1.5e-3 rel at these target masses)
        assert abs(m_wins - m_children) <= 1e-4 * max(m_children, 1.0), (
            t, m_children, m_wins)


def test_grouped_forces_at_force_tile_512():
    """The shipping presets run force_tile=512 (PERF.md '4M retune'):
    the band decomposition must stay exact-within-theta there too —
    near-child runs can reach force_tile particles (SimConfig.win_pieces
    rationale) and the window machinery sees a different granularity."""
    pos, mass = _cloud(6000, seed=3)
    cfg = SimConfig(n=6000, theta=0.5, force_tile=512, use_pallas=False,
                    check_overflow=False)
    from nbody_tpu.models.simulation import sort_by_morton

    sc, perm, lo, size = sort_by_morton(pos, cfg)
    ps, ms, cs = forces.pad_sorted(pos[perm], mass[perm], sc, cfg.force_tile)
    acc = np.asarray(forces.bh_forces_grouped(ps, ms, cs, cfg))[: pos.shape[0]]
    ref = _numpy_direct(pos[perm], mass[perm], cfg.g, forces.soft_term(cfg))
    err = np.linalg.norm(acc - ref, axis=1) / (np.linalg.norm(ref, axis=1) + 1e-9)
    # theta=0.5 monopole truncation error bound (matches the 256-tile test)
    assert float(np.median(err)) < 0.01
    assert float(np.max(err)) < 0.2


def test_table_bytes_accounting():
    cfg = SimConfig(n=4_000_000, force_tile=512, sup_cap=384, mid_cap=512,
                    cmid_cap=768, near_cap=1536)
    rows = 1536 + 9 * (cfg.ss_cap + 384 + 512 + 768)
    assert cfg.table_bytes == 4 * 4 * cfg.n_groups * rows


def test_refresh_farmid_identity_at_unchanged_positions():
    """forces.refresh_farmid (cfg.refresh_moments) recomputes every
    source moment from LIVE positions at a FROZEN cut and regathers the
    tables against the frozen classification.  With positions unchanged
    the frozen cut, the moments, and the tables are the ones the
    original build produced — the refreshed far+mid must be bit-equal
    to apply_farmid over the original build (both paths run the same
    deterministic compensated prefix sums)."""
    pos, mass = _cloud(6000, seed=11)
    cfg = SimConfig(n=6000, theta=0.5, force_tile=256, use_pallas=False,
                    check_overflow=False)
    from nbody_tpu.models.simulation import sort_by_morton

    sc, perm, lo, size = sort_by_morton(pos, cfg)
    ps, ms, cs = forces.pad_sorted(pos[perm], mass[perm], sc, cfg.force_tile)
    cells, ss, bands, tables = forces.build_bands(ps, ms, cs, cfg)
    want = forces.apply_farmid(ps, ss, tables, cfg)

    blo, bsz = bbox.bounding_cube(ps)
    got = forces.refresh_farmid(ps, ms, cs, None, blo, bsz, bands, cfg)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_refresh_farmid_tracks_moved_positions():
    """The actual reuse scenario (advisor r4): positions DRIFT within
    their skin envelopes after the build, then a moment refresh
    recomputes the source moments from the LIVE positions at the frozen
    cut.  The refreshed far+mid plus the live near band must still be a
    conservative-MAC force for the moved positions (same theta-level
    error bound as a fresh build), and the refresh must actually track
    the motion — measurably different from re-evaluating the STALE
    rebuild-time tables.  (The Pallas twins of the same sweeps are
    exercised on real hardware by bench.py's two-geometry selfcheck.)"""
    pos, mass = _cloud(6000, seed=12)
    n = pos.shape[0]
    cfg = SimConfig(n=6000, theta=0.5, force_tile=256, use_pallas=False,
                    check_overflow=False)
    from nbody_tpu.models.simulation import sort_by_morton

    sc, perm, lo, size = sort_by_morton(pos, cfg)
    ps, ms, cs = forces.pad_sorted(pos[perm], mass[perm], sc, cfg.force_tile)
    # skin envelopes sized to cover the move below (the runner's contract:
    # no particle leaves its envelope between rebuild and refresh)
    step = 2.0
    drift = jnp.full((ps.shape[0],), 4.0 * step, jnp.float32)
    cells, ss, bands, tables = forces.build_bands(ps, ms, cs, cfg,
                                                  drift=drift)
    rng = np.random.default_rng(5)
    move = jnp.asarray(
        rng.uniform(-step, step, size=ps.shape).astype(np.float32))
    ps2 = ps + move

    blo, bsz = bbox.bounding_cube(ps)
    afm = forces.refresh_farmid(ps2, ms, cs, drift, blo, bsz, bands, cfg)
    stale = forces.apply_farmid(ps2, ss, tables, cfg)
    assert float(jnp.max(jnp.abs(afm - stale))) > 0.0, (
        "a refresh after real motion must differ from the stale tables"
    )

    acc = np.asarray(afm + forces.apply_near(ps2, ps2, ms, bands, cfg))[:n]
    ref = _numpy_direct(np.asarray(ps2)[:n], np.asarray(ms)[:n], cfg.g,
                        forces.soft_term(cfg))
    err = np.linalg.norm(acc - ref, axis=1) / (
        np.linalg.norm(ref, axis=1) + 1e-9)
    assert float(np.median(err)) < 0.01
    assert float(np.max(err)) < 0.2
