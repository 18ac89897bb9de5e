"""Probe: why does the student's grid refresh never discover the
bbox-added geometry (tests/test_editing.py::
test_override_teacher_renders_added_geometry, VERDICT r3 missing #1)?

Replicates the test flow with instrumentation: student density stats
inside the fill region after pretrain and after each distill epoch, occ
counts in/out of region, and whether rays ever produce density there.
"""
import os
import sys as _sys
_sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
import jax
jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp

from sealdnerf_tpu.data.synthetic import make_synthetic_scene
from sealdnerf_tpu.models.cp import CPConfig, make_cp_field
from sealdnerf_tpu.train.trainer import TrainOptions
from sealdnerf_tpu.train.fast import FastTrainer
from sealdnerf_tpu.editing.student import FastStudentTrainer
from sealdnerf_tpu.editing.seal_utils import get_seal_mapper

ws = "/tmp/probe_edit_ws"
os.makedirs(ws, exist_ok=True)
_, train, val = make_synthetic_scene(n_train=10, n_val=2, res=64)
cfg = CPConfig(bound=1.0, scales=((16, 8), (64, 16), (128, 16)), planes=())
topt = TrainOptions(iters=400, num_rays=1024, bound=1.0, dt_gamma=0.0,
                    grid_size=32, march_res=16, n_intervals=8,
                    steps_per_interval=3, segment_steps=32,
                    update_extra_interval=8, workspace=ws,
                    eval_interval=1000)
tfield = make_cp_field(jax.random.PRNGKey(0), cfg)
teacher = FastTrainer("cp", topt, tfield, workspace=ws + "/teacher",
                      use_checkpoint="scratch")
_cache = os.path.join(ws, "teacher_cache.npz")
if os.path.exists(_cache):
    import pickle
    with open(_cache, "rb") as f:
        blob = pickle.load(f)
    teacher.params = jax.tree_util.tree_map(jnp.asarray, blob["params"])
    teacher.ema_params = jax.tree_util.tree_map(jnp.asarray,
                                                blob["params"])
    teacher.field.params = teacher.params
    teacher.grid_state = jax.tree_util.tree_map(jnp.asarray, blob["grid"])
    print("teacher loaded from cache", flush=True)
else:
    teacher.train(train, None, max_epochs=25)
    import pickle
    with open(_cache, "wb") as f:
        pickle.dump({"params": jax.tree_util.tree_map(np.asarray,
                                                      teacher.params),
                     "grid": jax.tree_util.tree_map(np.asarray,
                                                    teacher.grid_state)},
                    f)
print("teacher iter_density:", int(teacher.grid_state["iter_density"]),
      "occ:", int(np.asarray(teacher.grid_state["occ"]).sum()), flush=True)

t = np.eye(4); t[1, 3] = 0.35
gr = np.random.default_rng(3).normal(size=(256, 3))
gr /= np.linalg.norm(gr, axis=-1, keepdims=True)
shell = gr * 0.36 + np.array([0, 0.1, 0])
mapper = get_seal_mapper(ws, {"type": "bbox", "raw": shell.tolist(),
                              "transform": t.tolist(),
                              "scale": [1, 1, 1], "boundType": "both"})
sfield = make_cp_field(jax.random.PRNGKey(1), cfg)
sfield.params = jax.tree_util.tree_map(lambda x: x.copy(), teacher.params)
student = FastStudentTrainer("cp", topt, sfield, teacher, mapper=mapper,
                             workspace=ws + "/student",
                             use_checkpoint="scratch")
student.params = sfield.params
student.grid_state = jax.tree_util.tree_map(lambda x: x.copy(),
                                            teacher.grid_state)

fill = np.asarray(student.fill_mask)          # [CAS, H, H, H]
print("fill_mask cells:", fill.sum(), "of", fill.size, flush=True)
md = mapper.map_data
print("force_fill_bound:", np.asarray(md["force_fill_bound"]), flush=True)

# target-region world points (the ADDED geometry lives here): shell
# center [0, 0.45, 0], radius 0.36 -> sample inside
rng = np.random.default_rng(0)
pts_t = rng.uniform(-1, 1, size=(4096, 3)).astype(np.float32)
pts_t = pts_t * 0.3 + np.array([0, 0.45, 0], np.float32)


def region_stats(tag, tr):
    sig = np.asarray(jax.jit(tr.field.density)(tr.params,
                                               jnp.asarray(pts_t))[0])
    g = np.asarray(tr.grid_state["density_grid"])  # [CAS, h3]
    occ = np.asarray(tr.grid_state["occ"])
    gin = g.reshape(occ.shape)[fill]
    md_ = float(np.asarray(tr.grid_state["mean_density"]))
    thr = min(md_, 0.01)
    print(f"[{tag}] field sigma in region: mean {sig.mean():.4f} "
          f"max {sig.max():.4f} frac>thr {(sig > thr).mean():.3f} | "
          f"grid in region: max {gin.max():.4f} n>=0 {(gin >= 0).sum()} "
          f"n>thr {(gin > thr).sum()} | occ {occ.sum()} "
          f"occ-in-region {occ[fill].sum()} mean_density {md_:.4f} "
          f"iter_density {int(np.asarray(tr.grid_state['iter_density']))}",
          flush=True)


# teacher (edit-aware) density in region: what the student should learn
tsig = np.asarray(jax.jit(student.teacher_field.density)(
    teacher.params, jnp.asarray(pts_t))[0])
print("TEACHER(mapped) sigma in region: mean %.4f max %.4f frac>0.01 %.3f"
      % (tsig.mean(), tsig.max(), (tsig > 0.01).mean()), flush=True)
# where do target points map to, and what does the BASE teacher say there?
mp, _, mmask = mapper.map_to_origin(jnp.asarray(pts_t), None)
mp_np = np.asarray(mp)
print("map_mask frac:", float(np.asarray(mmask).mean()),
      "mapped-pts y-range:", mp_np[:, 1].min(), mp_np[:, 1].max(),
      flush=True)
bsig = np.asarray(jax.jit(teacher.field.density)(teacher.params, mp)[0])
print("BASE teacher sigma at mapped pts: mean %.4f max %.4f frac>0.01 %.3f"
      % (bsig.mean(), bsig.max(), (bsig > 0.01).mean()), flush=True)

# proxy GT vs teacher's own render at a val pose: does the proxy image
# actually SHOW the edit?
from sealdnerf_tpu.data.rays import get_rays
rays = get_rays(jax.random.PRNGKey(0), jnp.asarray(val.poses[0])[None],
                jnp.asarray(val.intrinsics), val.h, val.w, -1)
img_proxy, _ = student.render_teacher_rays(rays["rays_o"][0],
                                           rays["rays_d"][0])
img_proxy = np.asarray(img_proxy).reshape(val.h, val.w, 3)
img_plain, _ = teacher.render_image(val.poses[0], val.intrinsics,
                                    val.h, val.w)
dif = np.abs(img_proxy - np.asarray(img_plain)).mean(-1)
print("proxy-vs-plain image: mean|diff| %.4f, frac pixels>0.05 %.4f"
      % (dif.mean(), (dif > 0.05).mean()), flush=True)

region_stats("pre", student)
student.init_pretraining(epochs=2, batch_size=2048, lr=0.05,
                         local_point_step=0.03,
                         surrounding_point_step=0.06,
                         global_point_step=-1)
for k, v in student.pretraining_data.items():
    print("zone", k, v["points"].shape, flush=True)

import dataclasses
train_ds = student.proxy_dataset(train)
for _ in range(2):
    student.epoch += 1
    loss = student.pretrain_one_epoch()
    print("pretrain loss", loss, "global_step", student.global_step,
          flush=True)
student.is_pretraining = False
region_stats("post-pretrain", student)

h, w, c, n = train_ds.h, train_ds.w, train_ds.images.shape[-1], len(train_ds)
print("proxy train images channels:", c, flush=True)

# does the proxy GT show the edit from a TRAIN pose?
rays0 = get_rays(jax.random.PRNGKey(0), jnp.asarray(train.poses[0])[None],
                 jnp.asarray(train.intrinsics), train.h, train.w, -1)
plain0, _ = teacher.render_image(train.poses[0], train.intrinsics,
                                 train.h, train.w)
d0 = np.abs(train_ds.images[0][..., :3] - np.asarray(plain0)).mean(-1)
print("proxy GT (train pose 0) vs plain teacher: mean|diff| %.4f "
      "frac>0.05 %.4f" % (d0.mean(), (d0 > 0.05).mean()), flush=True)

student.mark_untrained_grid(train_ds.poses, train_ds.intrinsics)
region_stats("post-mark", student)
data = train_ds.device()
for ep in range(5):
    m = student.train_segment(data, h, w, c, n, 32)
    region_stats(f"epoch{ep}", student)
    print("   seg loss:", float(m["loss"]), flush=True)

# after distillation: does the student's render match the proxy GT?
img_s, _ = student.render_image(train.poses[0], train.intrinsics,
                                train.h, train.w)
ds_ = np.abs(np.asarray(img_s) - train_ds.images[0][..., :3]).mean(-1)
print("student render vs proxy GT (train pose 0): mean|diff| %.4f "
      "frac>0.05 %.4f" % (ds_.mean(), (ds_ > 0.05).mean()), flush=True)
# and where are the worst pixels? project region center to the image
print("worst-row of diff image (argmax rows):",
      np.argsort(ds_.mean(1))[-5:], "of", train.h, flush=True)
