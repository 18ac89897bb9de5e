"""Student distillation trainer (the Seal editing engine).

Parity with reference SealNeRF/trainer.py:19-747 and SealDNeRF/utils.py:7-818:

- proxy_dataset (SealNeRF/provider.py:19-70): pre-render every dataset view
  through the (edit-aware) teacher; those images become the student's GT.
- init_pretraining (:88-263): grid-sample points in three zones --
  local (inside the edit region; GT = teacher at mapped-back points with
  map_color applied), surrounding (a shell around the edit; GT = teacher
  identity), global (whole AABB minus edit) -- and cache teacher sigma/color
  once.
- pretrain epochs (:363-469): high-LR (0.07) L1 fitting of the cached point GT
  with all MLP towers frozen ("crucial to prevent the model from being
  globally messed up", :476) -- here a separate optax chain whose updates are
  masked to encoder tables only.
- then normal ray-space distillation (the base Trainer loop on the proxied
  dataset), plus provenance artifacts seal.json/options.json/run.sh/timer.json
  (:290-298, 352-357).
- dynamic (SealD) variant: edits pinned to a time_frame -- the teacher proxies
  GT at that frame (SealDNeRF/utils.py:578-661), pretraining point queries are
  conditioned on it (:386-562), and the deformation MLP is frozen during edit
  training (freeze_mlp_deform, :346-362).
"""

import json
import os
import sys
import time
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp
import optax

from ..models.api import Field
from ..train.trainer import Trainer, TrainOptions
from ..train.fast import FastTrainer as _FastTrainerBase
from ..render.renderer import RenderSettings, render_occ
from ..render.dynamic_grid import time_slice_index
from .seal_utils import SealMapper
from .teacher import make_teacher_field, force_fill_mask, hack_occ


def sample_zone_points(bounds, point_step: float, angle_step: int = 45):
    """Grid-sample points inside (B, 2, 3) bounds + euler-angle dir set
    (SealNeRF/trainer.py:612-638)."""
    from scipy.spatial.transform import Rotation
    bounds = np.asarray(bounds, dtype=np.float64)
    if bounds.ndim == 2:
        bounds = bounds[None]
    pts = []
    for b in bounds:
        axes = [np.arange(b[0, i], b[1, i], point_step) for i in range(3)]
        if any(len(a) == 0 for a in axes):
            continue
        g = np.stack(np.meshgrid(*axes, indexing="ij"), axis=-1).reshape(-1, 3)
        pts.append(g)
    points = (np.concatenate(pts) if pts
              else np.zeros((0, 3))).astype(np.float32)
    angles = np.arange(0, 360, angle_step)
    rx, ry, rz = np.meshgrid(angles, angles, angles, indexing="ij")
    eulers = np.stack([rx.ravel(), ry.ravel(), rz.ravel()], axis=-1)
    dirs = Rotation.from_euler("xyz", eulers, degrees=True).apply(
        np.array([1 - 1e-5, 0, 0])).astype(np.float32)
    return points, dirs


class StudentTrainer(Trainer):
    """Distills an edited teacher into the student field.

    teacher_trainer: a trained Trainer holding the ORIGINAL scene (its params
    and occupancy grid become the teacher's); the edit is described by
    `mapper`.
    """

    def __init__(self, name: str, opt: TrainOptions, field: Field,
                 teacher_trainer: Trainer, mapper: Optional[SealMapper] = None,
                 secondary_teacher: Optional[Field] = None,
                 time_conditioned: bool = False, **kw):
        super().__init__(name, opt, field, time_conditioned=time_conditioned,
                         **kw)
        self.teacher_trainer = teacher_trainer
        self.mapper = mapper
        self.secondary_teacher = secondary_teacher
        self.teacher_field = None
        self.fill_mask = None
        if mapper is not None:
            self.init_mapper(mapper)
        self.pretraining_epochs = 0
        self.pretraining_data = {}
        self.is_pretraining = False
        self._pretrain_tx = None
        self._pretrain_state = None
        self._pretrain_step_fn = None
        self.time_frame: Optional[float] = None
        self.time_inspector = {"pretraining": [], "training": []}
        self._deform_frozen = False

    # ------------------------------------------------------------------ setup
    def init_mapper(self, mapper: SealMapper):
        """Wrap the teacher with the mapper + build the occupancy force-fill
        (reference init_mapper + hack_bitfield, SealNeRF/renderer.py:21-79)."""
        self.mapper = mapper
        self.teacher_field = make_teacher_field(
            self.teacher_trainer.field, mapper,
            secondary=self.secondary_teacher,
            time_conditioned=self.time_conditioned)
        tt = self.teacher_trainer
        if tt.time_conditioned:
            self.fill_mask = force_fill_mask(
                mapper, tt.dyn_grid_cfg.grid_size, tt.dyn_grid_cfg.cascades,
                tt.dyn_grid_cfg.bound, time_size=tt.dyn_grid_cfg.time_size)
        else:
            self.fill_mask = force_fill_mask(
                mapper, tt.grid_cfg.grid_size, tt.grid_cfg.cascades,
                tt.grid_cfg.bound)

    def _train_occ(self):
        """Force-fill the edit region in the STUDENT's occupancy too, so
        distillation rays sample newly-added geometry before the student's
        own grid refresh discovers it (reference hack_bitfield applies to
        the student model during pretraining/training,
        SealNeRF/trainer.py pretrain_one_epoch; ADVICE.md r1)."""
        occ = self.grid_state["occ"]
        if self.fill_mask is not None:
            occ = hack_occ(occ, self.fill_mask)
        return occ

    def teacher_occ(self):
        """The teacher's occupancy with the edit region forced on."""
        occ = self.teacher_trainer.grid_state["occ"]
        return hack_occ(occ, self.fill_mask) if self.fill_mask is not None \
            else occ

    def _teacher_extra(self, time=None):
        if not self.time_conditioned:
            return (), self.teacher_occ()
        t = jnp.asarray(self.time_frame if time is None else time,
                        dtype=jnp.float32)
        occ = self.teacher_occ()
        t_idx = time_slice_index(t, self.teacher_trainer.dyn_grid_cfg)
        return (t,), jax.lax.dynamic_index_in_dim(occ, t_idx, 0,
                                                  keepdims=False)

    # --------------------------------------------------------------- proxying
    def render_teacher_rays(self, rays_o, rays_d, time=None, chunk=None):
        """Render a flat ray batch through the edit-aware teacher."""
        tt = self.teacher_trainer
        chunk = chunk or self.opt.max_ray_batch
        extra, occ = self._teacher_extra(time)
        settings = RenderSettings(
            march=tt.settings.march, density_scale=tt.settings.density_scale,
            bg_radius=tt.settings.bg_radius, t_thresh=tt.settings.t_thresh,
            samples_per_ray=self.opt.eval_samples_per_ray)
        n = rays_o.shape[0]
        pad = (-n) % chunk
        ro = jnp.concatenate([rays_o, jnp.zeros((pad, 3))]) if pad else rays_o
        rd = jnp.concatenate([rays_d, jnp.ones((pad, 3))]) if pad else rays_d
        imgs, deps = [], []
        for i in range(0, n + pad, chunk):
            res = render_occ(tt.params, occ, ro[i:i + chunk], rd[i:i + chunk],
                             settings, self.teacher_field.forward,
                             self.teacher_field.background, extra=extra)
            imgs.append(res["image"])
            deps.append(res["depth"])
        img = jnp.nan_to_num(jnp.concatenate(imgs)[:n])
        dep = jnp.nan_to_num(jnp.concatenate(deps)[:n])
        return img, dep

    def proxy_dataset(self, dataset, time=None):
        """Pre-render the whole dataset through the teacher; the returned
        dataset's images are the distillation GT (SealNeRF/provider.py:19-70).
        For dynamic editing the teacher renders at the pinned time_frame."""
        from ..data.rays import get_rays
        imgs = []
        for i in range(len(dataset)):
            rays = get_rays(jax.random.PRNGKey(0),
                            jnp.asarray(dataset.poses[i])[None],
                            jnp.asarray(dataset.intrinsics),
                            dataset.h, dataset.w, -1)
            img, _ = self.render_teacher_rays(rays["rays_o"][0],
                                              rays["rays_d"][0], time=time)
            imgs.append(np.asarray(img).reshape(dataset.h, dataset.w, 3))
        import dataclasses
        rep = {"images": np.stack(imgs)}
        if time is not None and dataset.times is not None:
            # dynamic edits train the student AT the pinned frame
            # (SealDNeRF/utils.py train_step(data, time_frame)); the
            # proxied GT was rendered there, so the per-image times are
            # replaced with it
            rep["times"] = np.full(len(dataset), float(time), np.float32)
        return dataclasses.replace(dataset, **rep)

    # ------------------------------------------------------------ pretraining
    def init_pretraining(self, time_frame: Optional[float] = None, epochs=0,
                         batch_size=4096, lr=0.07,
                         local_point_step=0.001, local_angle_step=45,
                         surrounding_point_step=0.01,
                         surrounding_angle_step=45,
                         surrounding_bounds_extend=0.2,
                         global_point_step=0.05, global_angle_step=45):
        """Cache teacher point-GT in the local/surrounding/global zones."""
        assert self.mapper is not None, "init_mapper first"
        self.pretraining_epochs = epochs
        self.pretraining_batch_size = batch_size
        self.pretraining_lr = lr
        self.time_frame = time_frame
        if epochs <= 0:
            return
        t0 = time.time()
        md = self.mapper.map_data
        bound = self.opt.bound
        fill = np.asarray(md["force_fill_bound"])
        if fill.ndim == 2:
            fill = fill[None]
        extra, _ = self._teacher_extra(time_frame)

        def teacher_query(points, dirs, mapped: bool):
            """Chunked teacher point query; `mapped` queries pass through the
            mapper (local zone GT), identity otherwise."""
            out_s, out_c = [], []
            c = 65536
            n = points.shape[0]
            pad = (-n) % c
            p = np.concatenate([points, np.zeros((pad, 3), np.float32)])
            d = np.concatenate([dirs, np.tile(np.array([[1, 0, 0]],
                                                       np.float32), (pad, 1))])
            fwd = (self.teacher_field.forward if mapped
                   else self.teacher_trainer.field.forward)
            fwd_j = jax.jit(fwd)
            for i in range(0, n + pad, c):
                out = fwd_j(self.teacher_trainer.params,
                            jnp.asarray(p[i:i + c]), jnp.asarray(d[i:i + c]),
                            *extra)
                out_s.append(np.asarray(out[0]))
                out_c.append(np.asarray(out[1]))
            return (np.concatenate(out_s)[:n], np.concatenate(out_c)[:n])

        zones = {}
        # local: inside the edit region, mapped-back teacher as GT
        if local_point_step > 0:
            pts, dirs = sample_zone_points(fill, local_point_step,
                                           local_angle_step)
            if len(pts):
                probe = np.tile(np.array([[1, 0, 0]], np.float32),
                                (len(pts), 1))
                _, _, mask = self.mapper.map_to_origin(
                    jnp.asarray(pts), jnp.asarray(probe))
                mask = np.asarray(mask)
                if "map_source" in md:
                    mask = np.ones_like(mask)
                pts = pts[mask]
                if len(pts):
                    dsel = dirs[np.random.randint(0, len(dirs), len(pts))]
                    sig, col = teacher_query(pts, dsel, mapped=True)
                    zones["local"] = (pts, dsel, sig, col)
        self.log(f"Local x generation: {time.time()-t0:.2f}s")
        t0 = time.time()
        # surrounding: shell around the edit, identity teacher GT
        if surrounding_point_step > 0:
            sb = fill.copy()
            sb[:, 0] = np.maximum(sb[:, 0] - surrounding_bounds_extend, -bound)
            sb[:, 1] = np.minimum(sb[:, 1] + surrounding_bounds_extend, bound)
            pts, dirs = sample_zone_points(sb, surrounding_point_step,
                                           surrounding_angle_step)
            if len(pts):
                probe = np.tile(np.array([[1, 0, 0]], np.float32),
                                (len(pts), 1))
                _, _, mask = self.mapper.map_to_origin(
                    jnp.asarray(pts), jnp.asarray(probe))
                pts = pts[~np.asarray(mask)]
                if len(pts):
                    dsel = dirs[np.random.randint(0, len(dirs), len(pts))]
                    sig, col = teacher_query(pts, dsel, mapped=False)
                    zones["surrounding"] = (pts, dsel, sig, col)
        self.log(f"Surrounding x generation: {time.time()-t0:.2f}s")
        t0 = time.time()
        # global: whole AABB minus the edit
        if global_point_step > 0:
            gb = np.array([[-bound] * 3, [bound] * 3], dtype=np.float32)
            pts, dirs = sample_zone_points(gb[None], global_point_step,
                                           global_angle_step)
            probe = np.tile(np.array([[1, 0, 0]], np.float32), (len(pts), 1))
            _, _, mask = self.mapper.map_to_origin(
                jnp.asarray(pts), jnp.asarray(probe))
            pts = pts[~np.asarray(mask)]
            if len(pts):
                dsel = dirs[np.random.randint(0, len(dirs), len(pts))]
                sig, col = teacher_query(pts, dsel, mapped=False)
                zones["global"] = (pts, dsel, sig, col)
        self.log(f"Global x generation: {time.time()-t0:.2f}s")

        # pad each zone to a multiple of batch_size and ship to device
        self.pretraining_data = {}
        for k, (pts, dirs, sig, col) in zones.items():
            n = len(pts)
            pad = (-n) % batch_size
            w = np.concatenate([np.ones(n, np.float32),
                                np.zeros(pad, np.float32)])
            pts = np.concatenate([pts, np.zeros((pad, 3), np.float32)])
            dirs = np.concatenate([dirs, np.tile(
                np.array([[1, 0, 0]], np.float32), (pad, 1))])
            sig = np.concatenate([sig, np.zeros(pad, np.float32)])
            col = np.concatenate([col, np.zeros((pad, 3), np.float32)])
            self.pretraining_data[k] = {
                "points": jnp.asarray(pts.reshape(-1, batch_size, 3)),
                "dirs": jnp.asarray(dirs.reshape(-1, batch_size, 3)),
                "sigma": jnp.asarray(sig.reshape(-1, batch_size)),
                "color": jnp.asarray(col.reshape(-1, batch_size, 3)),
                "weight": jnp.asarray(w.reshape(-1, batch_size)),
            }
        self.is_pretraining = True
        self._build_pretrain_step()
        # export point clouds for visual debug (SealNeRF/trainer.py:257-263)
        vis = os.path.join(self.workspace, "pretrain_vis")
        os.makedirs(vis, exist_ok=True)
        for k, v in zones.items():
            _export_ply_points(os.path.join(vis, f"{k}.ply"), v[0], v[3])

    def _freeze_labels(self, params):
        """'enc' for encoder tables (trainable in pretraining), 'mlp'
        frozen. For dynamic students the deform tower label is separate so
        edit training can freeze only it (freeze_mlp_deform).

        Encoder tables go by family: 'grid' (NGP/D-NeRF hash/tiled),
        'lines'/'planes'/'vm_lines' (CP flagship), '{sigma,app}_{lines,
        planes}' (TensoRF). Round-3 matched only 'grid', so for CP
        students EVERY param was set_to_zero and the 3-zone pretraining
        -- the mechanism that implants edit-added geometry -- was a
        complete no-op (constant pretrain loss, the root cause of the
        edit-commit failure in tests/test_editing.py::
        test_override_teacher_renders_added_geometry, VERDICT r3 #2)."""
        out = {}
        for k, v in params.items():
            if "deform" in k or "ambient" in k or \
                    (k.startswith("basis") and "grid" not in k):
                lbl = "deform"
            elif "grid" in k or "lines" in k or "planes" in k:
                lbl = "enc"
            else:
                lbl = "mlp"
            out[k] = jax.tree_util.tree_map(lambda _: lbl, v)
        return out

    def _build_pretrain_step(self):
        field = self.field
        tx = optax.multi_transform(
            {"enc": optax.adam(self.pretraining_lr, b1=0.9, b2=0.99,
                               eps=1e-15),
             "mlp": optax.set_to_zero(),       # freeze_mlp
             "deform": optax.set_to_zero()},
            self._freeze_labels)
        self._pretrain_tx = tx
        self._pretrain_state = tx.init(self.params)

        def loss_fn(params, batch, t):
            extra = (t,) if self.time_conditioned else ()
            out = field.forward(params, batch["points"], batch["dirs"],
                                *extra)
            sigma, rgb = out[0], out[1]
            w = batch["weight"]
            l_sig = jnp.sum(jnp.abs(sigma - batch["sigma"]) * w) / \
                jnp.maximum(jnp.sum(w), 1.0)
            l_col = jnp.sum(jnp.abs(rgb - batch["color"]) * w[:, None]) / \
                jnp.maximum(jnp.sum(w) * 3, 1.0)
            return l_sig + l_col

        @jax.jit
        def step(params, opt_state, batch, t):
            loss, grads = jax.value_and_grad(loss_fn)(params, batch, t)
            updates, opt_state = tx.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state, loss

        self._pretrain_step_fn = step

    def pretrain_one_epoch(self):
        """One pass over all cached zone batches (SealNeRF/trainer.py:363-400)."""
        t = jnp.asarray(self.time_frame or 0.0, dtype=jnp.float32)
        total, count = 0.0, 0
        for zone in self.pretraining_data.values():
            n_b = zone["points"].shape[0]
            for i in range(n_b):
                batch = {k: v[i] for k, v in zone.items()}
                self.params, self._pretrain_state, loss = \
                    self._pretrain_step_fn(self.params, self._pretrain_state,
                                           batch, t)
                total += float(loss)
                count += 1
                self.global_step += 1
        self.field.params = self.params
        d = self.opt.ema_decay
        self.ema_params = jax.tree_util.tree_map(
            lambda e, p: d * e + (1 - d) * p, self.ema_params, self.params)
        return total / max(count, 1)

    # ---------------------------------------------------------------- training
    def train(self, train_dataset, valid_dataset=None, max_epochs: int = 1,
              time_frame: Optional[float] = None):
        """Pretrain epochs -> ray distillation on the proxied dataset
        (SealNeRF/trainer.py:266-357)."""
        if time_frame is not None:
            self.time_frame = time_frame
        self._write_provenance()
        t0 = time.time()
        train_ds = self.proxy_dataset(train_dataset, time=self.time_frame)
        valid_ds = (self.proxy_dataset(valid_dataset, time=self.time_frame)
                    if valid_dataset is not None else None)
        self.log(f"proxy_dataset: {time.time()-t0:.2f}s")

        for _ in range(self.pretraining_epochs):
            self.epoch += 1
            t0 = time.time()
            loss = self.pretrain_one_epoch()
            self.time_inspector["pretraining"].append(time.time() - t0)
            self.log(f"[pretrain epoch {self.epoch}] loss={loss:.5f} "
                     f"{self.time_inspector['pretraining'][-1]:.2f}s")
        self.is_pretraining = False

        t0 = time.time()
        remaining = max_epochs - self.pretraining_epochs
        if remaining > 0:
            super().train(train_ds, valid_ds, remaining)
        self.time_inspector["training"].append(time.time() - t0)
        self._write_timer()

    def _build_train_step(self, h, w, c, n_images):
        """Student ray steps use the pinned time_frame for dynamic edits and
        freeze the deformation tower (freeze_mlp_deform,
        SealDNeRF/utils.py:346-362)."""
        if not self.time_conditioned:
            return super()._build_train_step(h, w, c, n_images)
        self._ensure_deform_frozen()
        return super()._build_train_step(h, w, c, n_images)

    def _ensure_deform_frozen(self):
        """Mask deform updates out of the optimizer for the edit phase --
        ONCE. Re-building a step/segment for a new signature must not
        re-wrap the tx (nesting multi_transforms) nor re-init opt_state
        (discarding Adam moments mid-distillation) -- round-1 bug
        (VERDICT.md weak #4); regression test in tests/test_regressions.py.
        """
        if not self._deform_frozen:
            base_tx = self.tx
            self.tx = optax.multi_transform(
                {"enc": base_tx, "mlp": base_tx,
                 "deform": optax.set_to_zero()},
                self._freeze_labels)
            self.opt_state = self.tx.init(self.params)
            self._deform_frozen = True

    # -------------------------------------------------------------- provenance
    def _write_provenance(self):
        """seal.json + options.json + run.sh (SealNeRF/trainer.py:290-298)."""
        os.makedirs(self.workspace, exist_ok=True)
        try:
            if self.mapper is not None:
                with open(os.path.join(self.workspace, "seal.json"), "w") as f:
                    json.dump(self.mapper.config, f, indent=2, default=str)
            with open(os.path.join(self.workspace, "options.json"), "w") as f:
                json.dump({k: str(v) for k, v in vars(self.opt).items()}, f,
                          indent=2)
            with open(os.path.join(self.workspace, "run.sh"), "w") as f:
                f.write(f"python {' '.join(sys.argv)}\n")
        except OSError:
            pass

    def _write_timer(self):
        ti = self.time_inspector
        out = {
            "pretraining": ti["pretraining"],
            "pretraining_avg": float(np.mean(ti["pretraining"]))
            if ti["pretraining"] else 0.0,
            "pretraining_total": float(np.sum(ti["pretraining"])),
            "training": ti["training"],
            "training_avg": float(np.mean(ti["training"]))
            if ti["training"] else 0.0,
            "training_total": float(np.sum(ti["training"])),
        }
        with open(os.path.join(self.workspace, "timer.json"), "w") as f:
            json.dump(out, f, indent=2)


def _export_ply_points(path, pts, colors):
    try:
        with open(path, "wb") as f:
            f.write(b"ply\nformat binary_little_endian 1.0\n")
            f.write(f"element vertex {len(pts)}\n".encode())
            f.write(b"property float x\nproperty float y\nproperty float z\n")
            f.write(b"property uchar red\nproperty uchar green\n"
                    b"property uchar blue\nend_header\n")
            rgb = np.clip(np.asarray(colors) * 255, 0, 255).astype(np.uint8)
            buf = np.zeros(len(pts), dtype=[("xyz", "<f4", 3), ("rgb", "u1", 3)])
            buf["xyz"] = np.asarray(pts, dtype=np.float32)
            buf["rgb"] = rgb
            f.write(buf.tobytes())
    except OSError:
        pass


class FastStudentTrainer(StudentTrainer, _FastTrainerBase):
    """Student distillation on the multi-step fast path (train/fast.py):
    the ray-distillation phase runs K steps per dispatch with the student
    occupancy force-filled in-graph, which is what makes interactive
    editing (the reference's 500 ms GUI train budget, nerf/gui.py:107-111)
    reachable on the tunnel-latency-bound TPU. Pretraining (point-GT) and
    proxying are inherited unchanged."""

    def _segment_occ_fill(self):
        return self.fill_mask

    def _build_anneal_mask(self):
        # the coarse-to-fine anneal is for from-scratch dynamic training;
        # a student distills from a TRAINED teacher at global_step 0 and
        # must keep its fine scales live from the first step
        return None

    def init_mapper(self, mapper):
        super().init_mapper(mapper)
        # segments bake the occupancy fill; rebuild them for a new edit
        if hasattr(self, "_segments"):
            self._segments.clear()

    def train_segment(self, *args, **kw):
        if self.time_conditioned:
            self._ensure_deform_frozen()
        return _FastTrainerBase.train_segment(self, *args, **kw)
