"""Multi-chip parallelism: meshes, shardings, pjit forwards."""
