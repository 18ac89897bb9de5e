"""Training engine: metrics, checkpointing, and the Trainer loop
(reference nerf/utils.py:206-1155 re-built around jitted pure steps)."""

from .metrics import PSNRMeter, SSIMMeter, LPIPSMeter
from .checkpoint import save_checkpoint, load_checkpoint, flatten_pytree, unflatten_pytree
from .trainer import Trainer, TrainOptions

__all__ = [
    "PSNRMeter", "SSIMMeter", "LPIPSMeter",
    "save_checkpoint", "load_checkpoint", "flatten_pytree", "unflatten_pytree",
    "Trainer", "TrainOptions",
]
