"""State dumps, golden-file parsing, and checkpoint/restore.

Dump format is byte-compatible with the legacy result files
(output_bh.txt:1-4): a 4-line '#' header then one `x y z vx vy vz` row per
body at %.6f — so tooling written against the reference's outputs keeps
working.  A fast C++ formatter (nbody_tpu/native) is used when built;
otherwise numpy.savetxt.

Checkpoint/restore is a new capability (the reference has none —
SURVEY.md §5): npz always, Orbax when available.
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import numpy as np

from nbody_tpu.config import SimConfig
from nbody_tpu.state import ParticleState


def dump_state_text(
    path: str,
    state: ParticleState,
    cfg: SimConfig,
    n_steps: int,
    positions_only: bool = False,
) -> None:
    """Write the legacy text dump (header per output_bh.txt:1-4).

    positions_only=True mirrors the first-generation `nbody.exe` dump
    (x y z rows only — format strings in that binary).
    """
    pos = np.asarray(state.pos, np.float64)
    vel = np.asarray(state.vel, np.float64)
    header = (
        "# Barnes-Hut N-Body Simulation Results\n"
        f"# Final positions and velocities after {n_steps} steps\n"
        f"# Bodies: {state.n}, Theta: {cfg.theta:.2f}, dt: {cfg.dt:.3f}\n"
        "# Format: x y z vx vy vz"
    )
    data = pos if positions_only else np.concatenate([pos, vel], axis=1)
    if positions_only:
        header = header.replace(" vx vy vz", "").replace(
            "positions and velocities", "positions"
        )

    native = _native_writer()
    if native is not None:
        native.write_dump(path, header, data)
        return
    np.savetxt(path, data, fmt="%.6f", header=header, comments="")


def load_dump(path: str) -> Tuple[dict, np.ndarray]:
    """Parse a legacy-format dump (ours or the reference's output_bh.txt).

    Returns (meta, rows) with meta from the '# Bodies: N, Theta: T, dt: D'
    header line when present.
    """
    meta = {}
    with open(path) as f:
        lines = f.readlines()
    body_start = 0
    for i, line in enumerate(lines):
        if not line.startswith("#"):
            body_start = i
            break
        if "Bodies:" in line:
            parts = line.lstrip("# ").replace(",", "").split()
            # 'Bodies: 10000 Theta: 0.50 dt: 0.030'
            for k, key in (("Bodies:", "bodies"), ("Theta:", "theta"), ("dt:", "dt")):
                if k in parts:
                    meta[key] = float(parts[parts.index(k) + 1])
    rows = np.loadtxt(lines[body_start:], dtype=np.float64)
    return meta, rows


def save_checkpoint(path: str, state: ParticleState, step: int = 0) -> None:
    np.savez(
        path,
        pos=np.asarray(state.pos),
        vel=np.asarray(state.vel),
        mass=np.asarray(state.mass),
        acc=np.asarray(state.acc),
        step=np.asarray(step),
    )


def load_checkpoint(path: str) -> Tuple[ParticleState, int]:
    z = np.load(path)
    state = ParticleState.create(z["pos"], z["vel"], z["mass"], z["acc"])
    return state, int(z["step"])


def save_checkpoint_orbax(path: str, state: ParticleState, step: int = 0) -> None:
    """Orbax checkpoint (async-capable, sharding-aware) — the production
    checkpointing path; the npz functions above are the zero-dependency
    fallback."""
    import orbax.checkpoint as ocp

    ckpt = ocp.PyTreeCheckpointer()
    ckpt.save(
        os.path.abspath(path),
        {"pos": state.pos, "vel": state.vel, "mass": state.mass,
         "acc": state.acc, "step": step},
    )


def load_checkpoint_orbax(path: str) -> Tuple[ParticleState, int]:
    import orbax.checkpoint as ocp

    ckpt = ocp.PyTreeCheckpointer()
    z = ckpt.restore(os.path.abspath(path))
    state = ParticleState.create(z["pos"], z["vel"], z["mass"], z["acc"])
    return state, int(z["step"])


_NATIVE = None
_NATIVE_TRIED = False


def _native_writer():
    """ctypes handle to the C++ fast dump writer, or None."""
    global _NATIVE, _NATIVE_TRIED
    if _NATIVE_TRIED:
        return _NATIVE
    _NATIVE_TRIED = True
    try:
        from nbody_tpu.native import runtime

        _NATIVE = runtime if runtime.available() else None
    except Exception:
        _NATIVE = None
    return _NATIVE
