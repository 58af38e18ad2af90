"""Ensemble (data-parallel) runs + Orbax checkpointing + 63-bit pipeline."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from nbody_tpu.config import SimConfig, PRESETS
from nbody_tpu.init import disk_galaxy_jax, uniform_cube
from nbody_tpu.models.ensemble import (
    stack_states, make_ensemble_step, shard_ensemble, make_sharded_ensemble_step,
)
from nbody_tpu.models.simulation import Simulation, step_barnes_hut
from nbody_tpu.parallel.shard import make_mesh


def test_vmapped_ensemble_matches_individual():
    cfg = SimConfig(n=256, force_tile=64, use_pallas=False,
                    sup_cap=16, mid_cap=64, near_cap=64, ic_rng="jax")
    states = [disk_galaxy_jax(cfg.n, seed=s, g=cfg.g) for s in range(3)]
    batched = stack_states(states)
    step = make_ensemble_step(cfg)
    out = step(batched)
    sim = Simulation(cfg)
    for e in range(3):
        want = sim.step(states[e])
        np.testing.assert_allclose(
            np.asarray(out.pos[e]), np.asarray(want.pos), rtol=1e-5, atol=1e-4
        )


def test_sharded_ensemble(eight_devices):
    cfg = SimConfig(n=128, force_tile=64, use_pallas=False,
                    sup_cap=16, mid_cap=64, near_cap=32, ic_rng="jax")
    states = [uniform_cube(cfg.n, seed=s) for s in range(8)]
    batched = stack_states(states)
    mesh = make_mesh(8)
    # rename axis for clarity
    from jax.sharding import Mesh
    import numpy as onp

    mesh_e = Mesh(onp.array(jax.devices()[:8]), ("ensemble",))
    sharded = shard_ensemble(batched, mesh_e, "ensemble")
    step = make_sharded_ensemble_step(cfg, mesh_e)
    out = step(sharded)
    jax.block_until_ready(out)
    assert out.pos.shape == (8, cfg.n, 3)
    assert np.isfinite(np.asarray(out.pos)).all()


def test_orbax_checkpoint_roundtrip(tmp_path):
    pytest.importorskip("orbax.checkpoint")
    from nbody_tpu.utils.io import save_checkpoint_orbax, load_checkpoint_orbax

    st = uniform_cube(64, seed=3)
    p = str(tmp_path / "ckpt")
    save_checkpoint_orbax(p, st, step=7)
    st2, step = load_checkpoint_orbax(p)
    assert step == 7
    np.testing.assert_array_equal(np.asarray(st.pos), np.asarray(st2.pos))


def test_legacy_63bit_pipeline_runs():
    cfg = PRESETS["bh_legacy"].replace(
        n=512, use_pallas=False, force_tile=64,
        sup_cap=16, mid_cap=128, near_cap=64,
    )
    assert cfg.morton_bits == 63
    st = disk_galaxy_jax(cfg.n, seed=0, g=cfg.g)
    out = step_barnes_hut(st, cfg)
    assert np.isfinite(np.asarray(out.pos)).all()
    # 63-bit and 30-bit sorts yield the same physics (order-invariant)
    cfg30 = cfg.replace(morton_bits=30)
    out30 = step_barnes_hut(st, cfg30)
    np.testing.assert_allclose(
        np.asarray(out.pos), np.asarray(out30.pos), rtol=1e-4, atol=1e-3
    )
