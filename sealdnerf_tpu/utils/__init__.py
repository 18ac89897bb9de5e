"""Host-side utilities: native extension loading, mesh extraction, misc."""

from .meshing import extract_geometry, save_ply

__all__ = ["extract_geometry", "save_ply"]
