"""Network families (parameters as pytrees, pure apply functions).

- ngp: Instant-NGP static network (reference nerf/network.py). The `--ff` and
  `--tcnn` backbones of the reference (nerf/network_ff.py, nerf/network_tcnn.py)
  collapse into this one on TPU: fully-fused/tcnn MLPs are CUDA scheduling
  tricks; XLA already fuses the tiny matmuls into the render step.
- dnerf: dynamic networks -- deform (dnerf/network.py), temporal basis
  (dnerf/network_basis.py), hyper (dnerf/network_hyper.py).
- sdf: SDF-fitting network (sdf/netowrk.py [sic]).
- tensorf: TensoRF CP/VM decompositions (rebuilt from the torch-ngp API
  surface; the reference snapshot's tensoRF package is missing).
"""

from .mlp import init_mlp, apply_mlp
from .ngp import NGPConfig, init_ngp, ngp_density, ngp_color, ngp_forward, ngp_background

__all__ = [
    "init_mlp", "apply_mlp",
    "NGPConfig", "init_ngp", "ngp_density", "ngp_color", "ngp_forward",
    "ngp_background",
]
