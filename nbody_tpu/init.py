"""Initial-condition generators.

The reference seeds the C runtime PRNG with ``srand(42)`` and builds a thin
disk galaxy on the host (nbody_v5.cu:395-414).  The shipped binaries are
Windows PE files, so "C rand()" means the MSVC LCG
(``state = state*214013 + 2531011; return (state>>16) & 0x7fff``).  We
reproduce that sequence bit-exactly (vectorized with jump-ahead doubling) so
the TPU build starts from the *identical* particle cloud as the CUDA v5
binaries — plus a `jax.random` variant for device-side generation at scales
where a host loop is silly.

The legacy `nbody_bh` generation used C++ ``<random>`` with an unspecified
seed (basics.txt:146-150); its exact stream is unrecoverable from the
binary, so `legacy_disk` reproduces the *distribution* (r·400 disk,
v = -0.01·r_perp rotation), which is what the golden-file statistical tests
compare against.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from nbody_tpu.config import SimConfig
from nbody_tpu.state import ParticleState

_MSVC_A = np.uint64(214013)
_MSVC_C = np.uint64(2531011)
_MASK32 = np.uint64(0xFFFFFFFF)


def msvc_rand_sequence(seed: int, count: int) -> np.ndarray:
    """First `count` outputs of MSVC rand() after srand(seed), as uint16.

    Vectorized with jump-ahead doubling: if S[k] is the LCG state after k+1
    steps, then S[k+L] = a_L*S[k] + b_L (mod 2^32) where (a_L, b_L) compose
    by squaring.  O(count) memory, O(log count) vector passes.
    """
    if count == 0:
        return np.empty((0,), np.uint16)
    s0 = np.uint64(seed & 0xFFFFFFFF)
    states = np.array([(_MSVC_A * s0 + _MSVC_C) & _MASK32], dtype=np.uint64)
    a, b = _MSVC_A, _MSVC_C  # advance-by-len(states) transform
    with np.errstate(over="ignore"):
        while states.shape[0] < count:
            ext = (a * states + b) & _MASK32
            states = np.concatenate([states, ext])
            a, b = (a * a) & _MASK32, (a * b + b) & _MASK32
    return ((states[:count] >> np.uint64(16)) & np.uint64(0x7FFF)).astype(np.uint16)


def msvc_rand_floats(seed: int, count: int) -> np.ndarray:
    """`(float)rand()/RAND_MAX` stream, RAND_MAX=32767, as float32
    (the C expression divides in single precision)."""
    return msvc_rand_sequence(seed, count).astype(np.float32) / np.float32(32767.0)


def disk_galaxy_msvc(n: int, seed: int = 42, g: float = 0.5) -> ParticleState:
    """Rebuild of the v5 host IC loop (nbody_v5.cu:395-414): bit-exact
    MSVC rand() stream, arithmetic in float32 like the reference's float
    expressions (position/velocity parity to fp32 rounding of the
    transcendentals).

    Per particle, five rand() draws in statement order: radius, angle,
    z-offset, mass, z-velocity.
    """
    f32 = np.float32
    u = msvc_rand_floats(seed, 5 * n).reshape(n, 5)
    r = f32(200.0) + u[:, 0] * f32(1500.0)
    a = u[:, 1] * (f32(2.0) * f32(np.pi))
    px = r * np.cos(a)
    py = r * np.sin(a)
    pz = (u[:, 2] - f32(0.5)) * (r * f32(0.05))
    mass = f32(2.0) + u[:, 3] * f32(5.0)
    # "Ključna ispravka" — circular orbital speed from the approximate
    # enclosed mass (nbody_v5.cu:406-409).
    approx_mass_inside = f32(50000.0) + r * f32(100.0)
    v_mag = np.sqrt(f32(g) * approx_mass_inside / r)
    vx = -np.sin(a) * v_mag
    vy = np.cos(a) * v_mag
    vz = (u[:, 4] - f32(0.5)) * f32(2.0)
    pos = np.stack([px, py, pz], axis=1).astype(np.float32)
    vel = np.stack([vx, vy, vz], axis=1).astype(np.float32)
    return ParticleState.create(pos, vel, mass.astype(np.float32))


def disk_galaxy_jax(n: int, seed: int = 42, g: float = 0.5) -> ParticleState:
    """Same disk-galaxy distribution, generated on-device with jax.random.

    Preferred at TPU scale (no host loop, no H2D copy of 4M-particle
    arrays); not bit-identical to the MSVC stream.
    """
    key = jax.random.PRNGKey(seed)
    ku = jax.random.uniform(key, (n, 5), jnp.float32)
    r = 200.0 + ku[:, 0] * 1500.0
    a = ku[:, 1] * (2.0 * np.pi)
    pos = jnp.stack([r * jnp.cos(a), r * jnp.sin(a), (ku[:, 2] - 0.5) * (r * 0.05)], axis=1)
    mass = 2.0 + ku[:, 3] * 5.0
    v_mag = jnp.sqrt(g * (50000.0 + r * 100.0) / r)
    vel = jnp.stack([-jnp.sin(a) * v_mag, jnp.cos(a) * v_mag, (ku[:, 4] - 0.5) * 2.0], axis=1)
    return ParticleState.create(pos, vel, mass)


def legacy_disk(n: int, seed: int = 0) -> ParticleState:
    """Distributional rebuild of the nbody_bh IC (basics.txt:146-150):
    r = u*400 disk, solid-rotation velocity v = 0.01 * r_perp.

    The golden dump (output_bh.txt) shows vz == 0 for every body, so the
    legacy run had no out-of-plane velocity; we match that.
    """
    key = jax.random.PRNGKey(seed)
    ku = jax.random.uniform(key, (n, 3), jnp.float32)
    a = ku[:, 0] * (2.0 * np.pi)
    r = ku[:, 1] * 400.0
    pos = jnp.stack([r * jnp.cos(a), r * jnp.sin(a), (ku[:, 2] - 0.5) * 100.0], axis=1)
    vel = jnp.stack([-pos[:, 1] * 0.01, pos[:, 0] * 0.01, jnp.zeros((n,))], axis=1)
    mass = jnp.ones((n,), jnp.float32)
    return ParticleState.create(pos, vel, mass)


def uniform_cube(n: int, seed: int = 0, half: float = 1000.0) -> ParticleState:
    """Uniform random cube — test fixture, not a reference workload."""
    key = jax.random.PRNGKey(seed)
    kp, km = jax.random.split(key)
    pos = jax.random.uniform(kp, (n, 3), jnp.float32, -half, half)
    mass = jax.random.uniform(km, (n,), jnp.float32, 1.0, 5.0)
    return ParticleState.create(pos, jnp.zeros((n, 3)), mass)


def make_initial_state(cfg: SimConfig) -> ParticleState:
    """Dispatch on cfg.ic_kind / cfg.ic_rng."""
    if cfg.ic_kind == "disk_galaxy":
        if cfg.ic_rng == "msvc_rand":
            return disk_galaxy_msvc(cfg.n, cfg.seed, cfg.g)
        return disk_galaxy_jax(cfg.n, cfg.seed, cfg.g)
    if cfg.ic_kind == "legacy_disk":
        return legacy_disk(cfg.n, cfg.seed)
    if cfg.ic_kind == "uniform_cube":
        return uniform_cube(cfg.n, cfg.seed)
    raise ValueError(f"unknown ic_kind: {cfg.ic_kind}")
