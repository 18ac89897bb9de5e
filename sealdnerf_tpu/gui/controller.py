"""Headless GUI controller: the train/render pacing logic of the reference
viewers (nerf/gui.py:89-153), separated from dearpygui.

- training interleave: 4..16 train steps per UI frame, auto-tuned to a 500 ms
  budget (nerf/gui.py:107-111).
- rendering: dynamic downscale 1/8..1 targeting a 200 ms frame (:136-140,
  bucketed to powers of two here to avoid retraces) and SPP accumulation in
  PREVIEW mode.
"""

import time
from typing import Optional

import numpy as np

from .orbit import OrbitCamera


class GUIController:
    def __init__(self, opt, trainer, train_dataset=None,
                 teacher_trainer=None):
        self.opt = opt
        self.trainer = trainer
        self.teacher_trainer = teacher_trainer
        self.render_trainer = trainer  # switchable (SealD gui trainer combo)
        self.train_dataset = train_dataset
        self.cam = OrbitCamera(opt.W, opt.H, r=opt.radius, fovy=opt.fovy)
        self.training = False
        self.time = 0.0  # dynamic scenes
        self.bg_color = np.ones(3, dtype=np.float32)
        self.downscale = 8
        self.spp = 1
        self.max_spp = getattr(opt, "max_spp", 64)
        self.render_buffer: Optional[np.ndarray] = None
        self.depth_buffer: Optional[np.ndarray] = None
        # depth rides the wire only while a back-projecting tool is
        # active (the edit controller toggles this); preview frames ship
        # the depth-free pack
        self.need_depth = False
        self.need_update = True
        self.train_steps = 16
        self._pending = None  # in-flight frame (pipelined preview)
        self._data_dev = None
        if train_dataset is not None:
            self._data_dev = train_dataset.device()

    # ---------------------------------------------------------------- training
    def train_frame(self):
        """Run one UI frame worth of training; auto-tunes steps to 500 ms."""
        if not self.training or self.train_dataset is None:
            return None
        ds = self.train_dataset
        out = self.trainer.train_gui(
            self._data_dev, step=self.train_steps, h=ds.h, w=ds.w,
            c=ds.images.shape[-1], n_images=len(ds))
        t = out["time"]
        # nerf/gui.py:107-111 pacing
        full_t = t / self.train_steps * 16
        train_steps = min(16, max(4, int(16 * 500 / (full_t * 1000 + 1e-9))))
        if train_steps > self.train_steps * 1.2 or \
                train_steps < self.train_steps * 0.8:
            self.train_steps = train_steps
        self.need_update = True
        return out

    # --------------------------------------------------------------- rendering
    def render_frame(self):
        """Render one view frame; returns (float [H, W, 3], dt).

        When the trainer exposes render_image_async (the fast path), a
        one-deep pipeline overlaps the frame's device compute + tunnel
        download with the GUI loop's other work (training interleave,
        event handling): dispatch the current state, display the frame
        dispatched on the PREVIOUS call (one frame of latency during
        motion, the standard double-buffering tradeoff). Falls back to
        the synchronous test_gui path otherwise."""
        if hasattr(self.render_trainer, "render_image_async"):
            return self._render_frame_pipelined()
        return self._render_frame_sync()

    def _render_frame_pipelined(self):
        rt = self.render_trainer
        want = self.need_update or self.spp < self.max_spp
        prev = getattr(self, "_pending", None)
        if want:
            ds = min([1, 2, 4, 8], key=lambda b: abs(b - self.downscale))
            kw = ({"time": self.time}
                  if getattr(rt, "time_conditioned", False) else {})
            h = rt.render_image_async(
                self.cam.pose, self.cam.intrinsics, self.opt.H, self.opt.W,
                bg_color=self.bg_color, downscale=ds,
                pack="yuv420" if self.need_depth else "preview",
                prefetch=True, **kw)
            self._pending = (h, time.time(), self.need_update)
            self.need_update = False
            if prev is None:      # first frame: consume synchronously
                prev, self._pending = self._pending, None
        if prev is None:
            return self.render_buffer, 0.0
        handle, t0, was_update = prev
        img, dep = handle.get()
        dt = time.time() - t0
        if not want:
            self._pending = None  # consumed; nothing new in flight
        img = self._upsample(img)
        if was_update:
            if dt > 0.25 and self.downscale < 8:
                self.downscale *= 2
            elif dt < 0.08 and self.downscale > 1:
                self.downscale //= 2
            self.render_buffer = img
            if dep is not None:
                self.depth_buffer = dep
            elif self.need_depth is False:
                self.depth_buffer = None
            self.spp = 1
        elif self.render_buffer is not None and \
                self.render_buffer.shape == img.shape:
            self.render_buffer = (
                self.render_buffer * self.spp + img) / (self.spp + 1)
            self.spp += 1
        return self.render_buffer, dt

    def _render_frame_sync(self):
        if self.need_update or self.spp < self.max_spp:
            t0 = time.time()
            out = self.render_trainer.test_gui(
                self.cam.pose, self.cam.intrinsics, self.opt.W, self.opt.H,
                bg_color=self.bg_color, spp=self.spp,
                downscale=self.downscale, need_depth=self.need_depth, **(
                    {"time": self.time}
                    if getattr(self.render_trainer, "time_conditioned", False)
                    else {}))
            dt = time.time() - t0
            # dynamic resolution targeting 200 ms (nerf/gui.py:136-140),
            # power-of-two buckets
            if self.need_update:
                if dt > 0.25 and self.downscale < 8:
                    self.downscale *= 2
                elif dt < 0.08 and self.downscale > 1:
                    self.downscale //= 2
                self.render_buffer = self._upsample(out["image"])
                if out["depth"] is not None:
                    self.depth_buffer = out["depth"]
                elif self.need_depth is False:
                    self.depth_buffer = None  # stale depth: view moved
                self.spp = 1
                self.need_update = False
            else:
                # SPP accumulation at fixed view
                img = self._upsample(out["image"])
                self.render_buffer = (
                    self.render_buffer * self.spp + img) / (self.spp + 1)
                self.spp += 1
            return self.render_buffer, dt
        return self.render_buffer, 0.0

    def _upsample(self, img):
        if img.shape[0] == self.opt.H:
            return img
        reps = self.opt.H // img.shape[0]
        return np.repeat(np.repeat(img, reps, axis=0), reps, axis=1)[
            :self.opt.H, :self.opt.W]

    def display_frame(self, img: np.ndarray) -> np.ndarray:
        """Hook for view-layer overlays; editors blend tool state in."""
        return img

    # ------------------------------------------------------------------ events
    def on_drag(self, dx, dy):
        self.cam.orbit(dx, dy)
        self.need_update = True

    def on_scroll(self, delta):
        self.cam.scale(delta)
        self.need_update = True

    def on_pan(self, dx, dy):
        self.cam.pan(dx, dy)
        self.need_update = True

    def set_time(self, t: float):
        self.time = float(np.clip(t, 0.0, 1.0))
        self.need_update = True

    def back_project(self, px: np.ndarray):
        """Pixel coords [N, 2] (x, y) -> world positions via the rendered
        depth (reference get_mask_pos, SealDNeRF/gui.py:229-235 +
        nerf/utils.py:826-830). Renders a depth frame on demand if the
        preview frames didn't carry one."""
        if self.depth_buffer is None:
            out = self.render_trainer.test_gui(
                self.cam.pose, self.cam.intrinsics, self.opt.W, self.opt.H,
                bg_color=self.bg_color, downscale=self.downscale,
                need_depth=True, **(
                    {"time": self.time}
                    if getattr(self.render_trainer, "time_conditioned", False)
                    else {}))
            self.depth_buffer = out["depth"]
        assert self.depth_buffer is not None
        h, w = self.depth_buffer.shape
        sx = w / self.opt.W
        sy = h / self.opt.H
        ix = np.clip((px[:, 0] * sx).astype(int), 0, w - 1)
        iy = np.clip((px[:, 1] * sy).astype(int), 0, h - 1)
        depth = self.depth_buffer[iy, ix]
        fx, fy, cx, cy = self.cam.intrinsics
        dirs = np.stack([(px[:, 0] - cx) / fx, (px[:, 1] - cy) / fy,
                         np.ones(len(px))], axis=-1)
        dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
        pose = self.cam.pose
        world_d = dirs @ pose[:3, :3].T
        origin = pose[:3, 3]
        mask = depth > 0
        return origin + depth[:, None] * world_d, mask
