"""TPU-native op substrate.

Every CUDA extension in the reference (raymarching, gridencoder, shencoder,
freqencoder, ffmlp) has an equivalent here, implemented the TPU way:

- grid_encode: multires hash/tiled grid encoding (gather + d-linear interp),
  parity with gridencoder/src/gridencoder.cu.
- sh_encode: real spherical harmonics degree 1..8, parity with
  shencoder/src/shencoder.cu.
- freq_encode: sin/cos positional encoding, parity with
  freqencoder/src/freqencoder.cu.
- morton: 3D Morton (Z-order) encode/decode, parity with
  raymarching/src/raymarching.cu:29-81.
- ray: ray-AABB slab intersection + background-sphere coords, parity with
  raymarching/src/raymarching.cu:92-209.
- marching: occupancy-grid ray marching with static shapes (dense candidate
  lattice + global compaction), replacing the two-pass atomic kernel at
  raymarching/src/raymarching.cu:312-490.
- composite: segmented-scan alpha compositing, replacing
  raymarching/src/raymarching.cu:501-693.
- activation: trunc_exp (activation.py:5-18).
- losses: mape / huber / eff_distloss (loss.py:7-76).

FFMLP (ffmlp/) intentionally has no kernel here: on TPU the MXU already fuses
small matmuls inside the jitted render step; the `--ff` flag is a no-op alias.
"""

from .activation import trunc_exp
from .morton import morton3d, morton3d_invert
from .ray import near_far_from_aabb, sph_from_ray
from .sh_encode import sh_encode, sh_output_dim
from .freq_encode import freq_encode, freq_output_dim
from .grid_encode import GridEncodeConfig, init_grid_table, grid_encode
from .composite import composite_rays, composite_packed
from .marching import MarchConfig, march_rays, candidate_ts, occupancy_at
from .packbits import packbits, unpackbits
from .losses import mape_loss, huber_loss, eff_distloss

__all__ = [
    "trunc_exp",
    "morton3d", "morton3d_invert",
    "near_far_from_aabb", "sph_from_ray",
    "sh_encode", "sh_output_dim",
    "freq_encode", "freq_output_dim",
    "GridEncodeConfig", "init_grid_table", "grid_encode",
    "composite_rays", "composite_packed",
    "MarchConfig", "march_rays", "candidate_ts", "occupancy_at",
    "packbits", "unpackbits",
    "mape_loss", "huber_loss", "eff_distloss",
]
