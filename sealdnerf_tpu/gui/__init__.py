"""Interactive GUI layer.

Parity with reference nerf/gui.py, dnerf/gui.py, SealNeRF/gui.py,
SealDNeRF/gui.py (dearpygui viewers with live training, dynamic-resolution
rendering, and the brush/texture/anchor edit tools).

Architecture: the reference mixes UI and logic in one class per GUI; here the
controller logic (orbit camera, train/render pacing, dynamic downscale, SPP
accumulation, edit-tool state machine, mask back-projection) lives in
headless classes (orbit.py, controller.py, edit_controller.py) that are
unit-tested on CPU, and the dearpygui views (nerf_gui.py, dnerf_gui.py,
seal_gui.py, seald_gui.py) are thin widget shells. dearpygui is imported
lazily: on machines without it (like this image) the controllers still work
and the views raise a clear error.

TPU note: renders stream from a persistent jitted render fn; downscale levels
are bucketed to powers of two so interactive resolution changes never
retrace (Trainer.test_gui).
"""

from .orbit import OrbitCamera
from .controller import GUIController
from .edit_controller import EditController, EditState

__all__ = ["OrbitCamera", "GUIController", "EditController", "EditState"]
