"""SealD-NeRF TPU: a TPU-native (JAX/XLA/Pallas) framework for static, dynamic,
and interactively-editable NeRFs.

Re-designed from scratch for TPU hardware with the capability surface of
ZhentaoHuang/SealD-NeRF (torch-ngp + D-NeRF + Seal-3D + SealD-NeRF):

- Instant-NGP-style static NeRF (multiresolution hash encoding, tiny MLPs,
  occupancy-grid-accelerated ray marching).
- D-NeRF dynamic NeRF (deformation / temporal-basis / hyper networks, time-axis
  occupancy grid).
- Seal-3D static editing (bbox/brush/anchor seal mappers, teacher->student
  distillation with point-GT pretraining).
- SealD-NeRF dynamic editing (edits pinned to a time frame, frozen deformation
  tower).

Design stance (TPU-first, not a CUDA port):
- All compute-path code is pure functional JAX, jitted once, static shapes.
- CUDA's atomic-compaction ray marching becomes a dense-candidate lattice +
  global-cumsum compaction into a packed static-size sample buffer, and alpha
  compositing becomes a segmented scan -- fully parallel and differentiable.
- Occupancy grid is explicit pytree state, not module buffers.
- Multi-chip scaling via jax.sharding.Mesh + ray-batch data parallelism.
"""

__version__ = "0.1.0"
