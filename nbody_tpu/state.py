"""Particle state pytree.

The reference keeps ten separate SoA float arrays on the device
(nbody_v5.cu:40-43).  Here the state is one registered pytree with packed
``[N, 3]`` vectors — XLA lays these out tiled for the VPU, and the pytree
moves through ``jax.jit`` / ``shard_map`` / checkpointing as a unit.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class ParticleState(NamedTuple):
    """Positions, velocities, masses (and last accelerations) of N bodies.

    Mirrors d_pos*/d_vel*/d_acc*/d_mass of the reference
    (nbody_v5.cu:40-43) as [N,3]/[N] float32 arrays.
    """

    pos: jax.Array    # [N, 3] float32
    vel: jax.Array    # [N, 3] float32
    mass: jax.Array   # [N]    float32
    acc: jax.Array    # [N, 3] float32 — acceleration from the last step

    @property
    def n(self) -> int:
        return self.pos.shape[0]

    @staticmethod
    def zeros(n: int, dtype=jnp.float32) -> "ParticleState":
        v3 = jnp.zeros((n, 3), dtype)
        return ParticleState(pos=v3, vel=v3, mass=jnp.zeros((n,), dtype), acc=v3)

    @staticmethod
    def create(pos, vel, mass, acc=None) -> "ParticleState":
        pos = jnp.asarray(pos, jnp.float32)
        vel = jnp.asarray(vel, jnp.float32)
        mass = jnp.asarray(mass, jnp.float32)
        if acc is None:
            acc = jnp.zeros_like(pos)
        return ParticleState(pos=pos, vel=vel, mass=mass, acc=acc)

    def permute(self, perm: jax.Array) -> "ParticleState":
        """Reorder all per-particle arrays by `perm` (e.g. Morton order)."""
        return ParticleState(
            pos=self.pos[perm], vel=self.vel[perm],
            mass=self.mass[perm], acc=self.acc[perm],
        )
