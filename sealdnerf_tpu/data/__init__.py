"""Data providers.

- rays: on-device ray generation / pixel sampling (reference nerf/utils.py:
  54-137 get_rays), run inside the jitted train step -- the host dataloader of
  the reference disappears from the hot path entirely.
- provider: transforms.json dataset loading (reference nerf/provider.py),
  host-side numpy; images preload to device HBM.
- synthetic: analytic procedural scene (orbiting cameras around lit spheres)
  used as the hermetic stand-in for nerf_synthetic in tests and benchmarks.
"""

from .rays import get_rays, rand_poses
from .provider import NeRFDataset, nerf_matrix_to_ngp
from .synthetic import make_synthetic_scene

__all__ = [
    "get_rays", "rand_poses", "NeRFDataset", "nerf_matrix_to_ngp",
    "make_synthetic_scene",
]
