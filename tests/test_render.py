"""Renderer: colormap parity, projection geometry, splat placement."""

import numpy as np
import jax.numpy as jnp
import pytest

from nbody_tpu.config import SimConfig
from nbody_tpu.state import ParticleState
from nbody_tpu.viz import render


def test_speed_colormap_endpoints():
    # v5 colormap (nbody_v5.cu:287-290)
    rgb0 = np.asarray(render.speed_colormap(jnp.zeros((1, 3))))
    np.testing.assert_allclose(rgb0[0], [0.4, 0.3, 1.0], atol=1e-6)
    rgb1 = np.asarray(render.speed_colormap(jnp.asarray([[150.0, 0, 0]])))
    np.testing.assert_allclose(rgb1[0], [1.0, 0.7, 0.3], atol=1e-6)
    rgb2 = np.asarray(render.speed_colormap(jnp.asarray([[9999.0, 0, 0]])))
    np.testing.assert_allclose(rgb2[0], rgb1[0], atol=1e-6)  # clamped


def test_projection_center_and_bounds():
    # particle at origin with camera at +z axis projects to screen center
    pos = jnp.zeros((1, 3))
    ix, iy, z, vis = render.project(pos, 4000.0, 0.0, 0.0, 1280, 720)
    assert bool(vis[0])
    assert int(ix[0]) == 640 and int(iy[0]) == 360
    assert float(z[0]) == pytest.approx(4000.0)

    # particle behind the camera is culled
    pos2 = jnp.asarray([[0.0, 0.0, 5000.0]])
    _, _, _, vis2 = render.project(pos2, 4000.0, 0.0, 0.0, 1280, 720)
    assert not bool(vis2[0])


def test_projection_off_axis():
    # +x world offset with identity rotation lands right of center
    pos = jnp.asarray([[100.0, 0.0, 0.0]])
    ix, iy, _, vis = render.project(pos, 4000.0, 0.0, 0.0, 1280, 720)
    assert bool(vis[0]) and int(ix[0]) > 640 and int(iy[0]) == 360
    # +y world offset lands ABOVE center (screen y decreases)
    pos = jnp.asarray([[0.0, 100.0, 0.0]])
    ix, iy, _, _ = render.project(pos, 4000.0, 0.0, 0.0, 1280, 720)
    assert int(iy[0]) < 360 and int(ix[0]) == 640


def test_render_frame_add_and_depth():
    pos = jnp.asarray([[0.0, 0.0, 0.0], [0.0, 0.0, 100.0]])
    vel = jnp.asarray([[0.0, 0.0, 0.0], [300.0, 0.0, 0.0]])
    for mode in ("add", "depth"):
        frame = np.asarray(
            render.render_frame(pos, vel, 4000.0, 0.0, 0.0, 64, 64, mode=mode)
        )
        assert frame.shape == (64, 64, 3)
        assert frame.max() <= 1.0 and frame.min() >= 0.0
        assert frame[32, 32].sum() > 0  # both project to the center pixel
    # depth mode: nearer particle (z=100 toward camera) wins; it is the
    # fast red-ish one -> red channel should reflect the fast colormap
    f = np.asarray(render.render_frame(pos, vel, 4000.0, 0.0, 0.0, 64, 64, mode="depth"))
    np.testing.assert_allclose(f[32, 32], [1.0, 0.7, 0.3], atol=1e-5)


def test_render_state_and_ppm(tmp_path):
    cfg = SimConfig(n=16, render_width=32, render_height=32)
    rng = np.random.default_rng(0)
    st = ParticleState.create(
        rng.uniform(-500, 500, (16, 3)).astype(np.float32),
        rng.uniform(-10, 10, (16, 3)).astype(np.float32),
        np.ones(16, np.float32),
    )
    frame = render.render_state(st, cfg)
    assert frame.shape == (32, 32, 3)
    p = str(tmp_path / "f.ppm")
    render.write_ppm(p, frame)
    with open(p, "rb") as fh:
        head = fh.read(20)
    assert head.startswith(b"P6 32 32 255")


def test_orbit_camera_mirrors_glut_sensitivity():
    cam = render.OrbitCamera(SimConfig())
    assert cam.distance == 4000.0 and cam.rot_x == 30.0 and cam.rot_y == 45.0
    cam.drag(10, -5)
    assert cam.rot_y == pytest.approx(45.0 + 2.0)
    assert cam.rot_x == pytest.approx(30.0 - 1.0)
    cam.scroll(2)
    assert cam.distance == pytest.approx(4000.0 - 300.0)
