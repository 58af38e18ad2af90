"""Semi-implicit Euler (Euler-Cromer) integration.

Mirrors integrateKernel (nbody_v5.cu:251-276): velocity first, then the
MAX_SPEED clamp (v5 only — the legacy generation's integrateKernel has no
clamp, basics.txt:116-123), then position.  Pure elementwise jnp; XLA fuses
this into the tail of the force computation.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from nbody_tpu.config import SimConfig
from nbody_tpu.state import ParticleState


def integrate(state: ParticleState, acc: jax.Array, cfg: SimConfig) -> ParticleState:
    vel = state.vel + acc * cfg.dt
    if cfg.clamp_speed:
        speed_sq = jnp.sum(vel * vel, axis=1, keepdims=True)
        max_sq = cfg.max_speed * cfg.max_speed
        scale = jnp.where(
            speed_sq > max_sq, cfg.max_speed * jax.lax.rsqrt(speed_sq), 1.0
        )
        vel = vel * scale
    pos = state.pos + vel * cfg.dt
    return ParticleState(pos=pos, vel=vel, mass=state.mass, acc=acc)
