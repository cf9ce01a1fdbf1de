"""Ensemble runtime: trajectory batching over devices (mesh / vmap)."""
