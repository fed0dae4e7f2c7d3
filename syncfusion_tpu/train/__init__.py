"""Training loops (pjit data-parallel over the device mesh)."""
