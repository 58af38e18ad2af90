"""On-device point-splat renderer.

Replaces the reference's CUDA->OpenGL interop path (nbody_v5.cu:278-356):
`updateVisualsKernel` + fixed-pipeline GL_POINTS become a camera transform
and a scatter-add rasterization, all inside jit, emitting an RGB
framebuffer on the device.  Frames can be streamed to the host for display
or encoding — there is no GL dependency anywhere.

Parity details:
  * speed colormap: t = min(|v|/150, 1), rgb = (0.4+0.6t, 0.3+0.4t,
    1.0-0.7t)  (nbody_v5.cu:287-290)
  * camera: eye at (0,0,camDistance) looking at the origin with +y up,
    then rotX about x and rotY about y (nbody_v5.cu:340-342), perspective
    fov 45deg, near 10, far 1e6 (nbody_v5.cu:472-473), default window
    1280x720 (nbody_v5.cu:387)
  * default orbit start rotX=30, rotY=45, distance 4000
    (nbody_v5.cu:35-36)

Two composite modes:
  * "add"   — additive splatting (points accumulate brightness; good for
              dense galaxies), clipped to [0,1]
  * "depth" — nearest-point-wins via a scatter-min z-buffer, the closest
              analog of the reference's GL_DEPTH_TEST point rendering
              (nbody_v5.cu:475)
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from nbody_tpu.config import SimConfig
from nbody_tpu.state import ParticleState


def speed_colormap(vel: jax.Array) -> jax.Array:
    """[N,3] velocities -> [N,3] rgb in [0,1] (nbody_v5.cu:286-290)."""
    speed = jnp.linalg.norm(vel, axis=1)
    t = jnp.minimum(speed / 150.0, 1.0)
    return jnp.stack([0.4 + 0.6 * t, 0.3 + 0.4 * t, 1.0 - 0.7 * t], axis=1)


def _rot_x(deg):
    r = jnp.deg2rad(deg)
    c, s = jnp.cos(r), jnp.sin(r)
    return jnp.array([[1, 0, 0], [0, c, -s], [0, s, c]], jnp.float32)


def _rot_y(deg):
    r = jnp.deg2rad(deg)
    c, s = jnp.cos(r), jnp.sin(r)
    return jnp.array([[c, 0, s], [0, 1, 0], [-s, 0, c]], jnp.float32)


def project(
    pos: jax.Array,
    cam_distance: float,
    rot_x_deg: float,
    rot_y_deg: float,
    width: int,
    height: int,
    fov_deg: float = 45.0,
    near: float = 10.0,
    far: float = 1.0e6,
):
    """World positions -> (pixel_x, pixel_y, eye_depth, visible_mask)."""
    r = _rot_x(rot_x_deg) @ _rot_y(rot_y_deg)
    eye = pos @ r.T
    eye = eye.at[:, 2].add(-cam_distance)  # lookAt(0,0,d) == translate -d
    z = -eye[:, 2]                         # positive depth in front
    f = 1.0 / np.tan(np.deg2rad(fov_deg) / 2.0)
    aspect = width / height
    safe_z = jnp.maximum(z, 1e-6)
    ndc_x = (f / aspect) * eye[:, 0] / safe_z
    ndc_y = f * eye[:, 1] / safe_z
    px = (ndc_x + 1.0) * 0.5 * width
    py = (1.0 - ndc_y) * 0.5 * height
    ix = jnp.floor(px).astype(jnp.int32)
    iy = jnp.floor(py).astype(jnp.int32)
    visible = (z > near) & (z < far) & (ix >= 0) & (ix < width) & (iy >= 0) & (iy < height)
    return ix, iy, z, visible


@functools.partial(jax.jit, static_argnames=("width", "height", "mode"))
def render_frame(
    pos: jax.Array,
    vel: jax.Array,
    cam_distance: float,
    rot_x_deg: float,
    rot_y_deg: float,
    width: int = 1280,
    height: int = 720,
    mode: str = "add",
    exposure: float = 1.0,
) -> jax.Array:
    """Render [H, W, 3] float32 in [0,1]."""
    ix, iy, z, vis = project(pos, cam_distance, rot_x_deg, rot_y_deg, width, height)
    rgb = speed_colormap(vel)
    flat = jnp.where(vis, iy * width + ix, 0)
    npix = width * height

    if mode == "add":
        w = jnp.where(vis, exposure, 0.0)[:, None] * rgb
        fb = jnp.zeros((npix, 3), jnp.float32).at[flat].add(
            w, mode="drop", indices_are_sorted=False
        )
        return jnp.clip(fb, 0.0, 1.0).reshape(height, width, 3)

    if mode == "depth":
        big = jnp.float32(3.0e38)
        zval = jnp.where(vis, z, big)
        zbuf = jnp.full((npix,), big, jnp.float32).at[flat].min(zval, mode="drop")
        # a particle owns a pixel iff its depth equals the buffered minimum
        owns = vis & (zval <= zbuf[flat])
        w = jnp.where(owns, 1.0, 0.0)[:, None] * rgb
        cnt = jnp.zeros((npix,), jnp.float32).at[flat].add(jnp.where(owns, 1.0, 0.0))
        fb = jnp.zeros((npix, 3), jnp.float32).at[flat].add(w)
        fb = fb / jnp.maximum(cnt, 1.0)[:, None]  # average depth ties
        return fb.reshape(height, width, 3)

    raise ValueError(f"unknown mode {mode}")


def render_state(state: ParticleState, cfg: SimConfig, mode: str = "add", exposure: float = 1.0):
    return render_frame(
        state.pos, state.vel, cfg.cam_distance, cfg.cam_rot_x, cfg.cam_rot_y,
        cfg.render_width, cfg.render_height, mode, exposure,
    )


def write_ppm(path: str, frame) -> None:
    """Dependency-free image output (binary PPM)."""
    img = np.asarray(jnp.clip(frame, 0, 1) * 255.0).astype(np.uint8)
    h, w, _ = img.shape
    with open(path, "wb") as f:
        f.write(f"P6 {w} {h} 255\n".encode())
        f.write(img.tobytes())


class OrbitCamera:
    """Host-side camera state machine mirroring the GLUT callbacks
    (nbody_v5.cu:460-469): drag rotates 0.2 deg/px, scroll zooms +-150."""

    def __init__(self, cfg: SimConfig):
        self.distance = cfg.cam_distance
        self.rot_x = cfg.cam_rot_x
        self.rot_y = cfg.cam_rot_y

    def drag(self, dx_px: float, dy_px: float) -> None:
        self.rot_y += dx_px * 0.2
        self.rot_x += dy_px * 0.2

    def scroll(self, clicks: int) -> None:
        self.distance -= 150.0 * clicks
