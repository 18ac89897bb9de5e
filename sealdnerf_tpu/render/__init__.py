"""Volume rendering: occupancy-grid state + the two render paths.

- grid: explicit occupancy-grid state pytree and its update/mark functions
  (reference nerf/renderer.py:61-101, 380-538 as pure functions).
- renderer: `render_occ` (the `-O` / cuda_ray fast path, reference
  nerf/renderer.py:256-377) and `render_uniform` (the pure-torch oracle path,
  reference nerf/renderer.py:125-253), both as jit-able pure functions.
"""

from .grid import GridConfig, init_grid_state, mark_untrained_grid, \
    update_density_grid, occupancy_bitfield
from .renderer import RenderSettings, render_occ, render_uniform, sample_pdf

__all__ = [
    "GridConfig", "init_grid_state", "mark_untrained_grid",
    "update_density_grid", "occupancy_bitfield",
    "RenderSettings", "render_occ", "render_uniform", "sample_pdf",
]
