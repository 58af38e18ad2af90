"""Multi-chip scaling: device meshes and the sharded Barnes-Hut step."""
