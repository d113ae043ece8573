"""Mesh-sharded surfaces: fused scenario steps, gridded cells, dedup campaigns."""
