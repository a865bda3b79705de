"""Multi-chip execution: device meshes and sharded separation."""
