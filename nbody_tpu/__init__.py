"""nbody_tpu — a TPU-native Barnes–Hut N-body simulation framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of the CUDA
reference `bgcarmin/NBody-Barnes-Hut-CUDA` (see /root/reference):

* direct O(N^2) gravity        (reference: nbody_simple.exe workload)
* Barnes-Hut octree gravity    (reference: nbody_v5.cu, nbody_bh.exe)
* Morton-code spatial sorting  (reference: nbody_v5.cu:57-78)
* semi-implicit Euler (Euler-Cromer) integration with speed clamp
                               (reference: nbody_v5.cu:251-276)
* on-device point-splat rendering (replaces the OpenGL path of
                               nbody_v5.cu:278-356)
* multi-chip scaling via jax.sharding / shard_map (new capability; the
  reference is single-GPU only)

Design notes
------------
The CUDA reference builds its octree by mutating a shared node pool with
atomics (nbody_v5.cu:98-156).  That is not a TPU-shaped algorithm.  Here the
tree is constructed *functionally* every step from the sorted Morton codes
using a Karras-style radix-tree build (fully vectorized, fixed shapes), the
centers of mass fall out of prefix sums over the sorted particle arrays
(deterministic — no atomics), and the force traversal runs over an
escape-index ("rope") linearization so every particle's tree walk is a simple
cursor loop with no stack.  The production force path converts the irregular
walk into dense (tile x interaction-list) arithmetic executed by a Pallas
kernel on the MXU/VPU.
"""

from nbody_tpu.config import SimConfig, PRESETS
from nbody_tpu.state import ParticleState
from nbody_tpu import init
from nbody_tpu.models.simulation import Simulation

__version__ = "0.1.0"

__all__ = [
    "SimConfig",
    "PRESETS",
    "ParticleState",
    "Simulation",
    "init",
    "__version__",
]
