"""Seal editing layer: edit-semantics mappers, teacher field wrapping,
occupancy force-fill, and the student distillation trainer.

Layer map (reference -> here):
- SealNeRF/color_utils.py  -> editing/color_utils.py
- SealNeRF/seal_utils.py   -> editing/seal_utils.py
- SealNeRF/renderer.py     -> editing/teacher.py (forward_fn wrapping +
                              functional bitfield hack)
- SealNeRF/trainer.py +
  SealDNeRF/utils.py       -> editing/student.py (proxy distillation,
                              point-GT pretraining, freeze masks)
"""

from .color_utils import rgb_to_hsv, hsv_to_rgb, modify_hsv, modify_rgb
from .seal_utils import (
    SealMapper, SealBBoxMapper, SealBrushMapper, SealAnchorMapper,
    get_seal_mapper,
)
from .teacher import make_teacher_field, force_fill_mask, hack_occ

__all__ = [
    "rgb_to_hsv", "hsv_to_rgb", "modify_hsv", "modify_rgb",
    "SealMapper", "SealBBoxMapper", "SealBrushMapper", "SealAnchorMapper",
    "get_seal_mapper",
    "make_teacher_field", "force_fill_mask", "hack_occ",
]
