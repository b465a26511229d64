"""Mesh construction and multi-chip utilities."""

from .mesh import walker_mesh

__all__ = ["walker_mesh"]
