"""SDF-fitting CLI (reference main_sdf.py + sdf/utils.py's slim Trainer):
fit a hashgrid SDF network to a mesh with MAPE loss, Adam (net weight-decay
1e-6), StepLR(10, 0.1), EMA; export the fitted surface with marching
tetrahedra.

Use `python main_sdf.py synthetic ...` to fit a procedural sphere mesh when
no mesh is on disk.
"""

import argparse
import os
import time

import numpy as np

from sealdnerf_tpu.utils.jaxsetup import setup_jax
setup_jax()
import jax
import jax.numpy as jnp
import optax

from sealdnerf_tpu.models.sdf import SDFConfig, init_sdf, sdf_forward
from sealdnerf_tpu.ops import mape_loss
from sealdnerf_tpu.train.checkpoint import save_checkpoint, load_checkpoint, \
    resolve_checkpoint, to_device


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("path", type=str)
    parser.add_argument("--test", action="store_true")
    parser.add_argument("--workspace", type=str, default="workspace")
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--lr", type=float, default=1e-3)
    parser.add_argument("--fp16", action="store_true")
    parser.add_argument("--ff", action="store_true", help="no-op alias (TPU)")
    parser.add_argument("--tcnn", action="store_true",
                        help="no-op alias (TPU)")
    parser.add_argument("--epochs", type=int, default=20)
    parser.add_argument("--num_samples", type=int, default=2 ** 18)
    parser.add_argument("--mesh_resolution", type=int, default=512)
    opt = parser.parse_args()
    print(opt)

    cfg = SDFConfig()
    params = init_sdf(jax.random.PRNGKey(opt.seed), cfg)
    ckpt_dir = os.path.join(opt.workspace, "checkpoints")

    if opt.test:
        path = resolve_checkpoint(opt.workspace, "sdf", "best")
        if path:
            state, _ = load_checkpoint(path)
            params = to_device(state["params"])
        _export(params, cfg, opt)
        return

    if opt.path.startswith("synthetic"):
        mesh_path = os.path.join(opt.workspace, "synthetic_sphere.ply")
        os.makedirs(opt.workspace, exist_ok=True)
        _make_sphere_mesh(mesh_path)
        opt.path = mesh_path

    from sealdnerf_tpu.data.sdf_provider import SDFDataset
    dataset = SDFDataset(opt.path, size=100, num_samples=opt.num_samples)

    # Adam with net weight decay 1e-6 + StepLR(10, 0.1) (main_sdf.py:51-57)
    def label(p):
        return {k: jax.tree_util.tree_map(
            lambda _: "enc" if k == "grid" else "net", v)
            for k, v in p.items()}

    sched = optax.exponential_decay(opt.lr, transition_steps=10 * 100,
                                    decay_rate=0.1, staircase=True)
    tx = optax.multi_transform({
        "enc": optax.adam(sched, b1=0.9, b2=0.99, eps=1e-15),
        "net": optax.chain(optax.add_decayed_weights(1e-6),
                           optax.adam(sched, b1=0.9, b2=0.99, eps=1e-15)),
    }, label)
    opt_state = tx.init(params)
    ema = jax.tree_util.tree_map(jnp.copy, params)

    @jax.jit
    def step(params, opt_state, ema, points, sdfs):
        def loss_fn(p):
            pred = sdf_forward(p, cfg, points)
            return mape_loss(pred, sdfs[:, 0])
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        ema = jax.tree_util.tree_map(lambda e, p: 0.95 * e + 0.05 * p, ema,
                                     params)
        return params, opt_state, ema, loss

    for epoch in range(1, opt.epochs + 1):
        t0 = time.time()
        losses = []
        for _ in range(len(dataset)):
            batch = dataset.sample_batch()
            params, opt_state, ema, loss = step(
                params, opt_state, ema, jnp.asarray(batch["points"]),
                jnp.asarray(batch["sdfs"]))
            losses.append(loss)
        print(f"[epoch {epoch}] loss={float(np.mean(jax.device_get(losses))):.6f} "
              f"{time.time()-t0:.1f}s", flush=True)
        save_checkpoint(os.path.join(ckpt_dir, f"sdf_ep{epoch:04d}.npz"),
                        {"params": params, "ema": ema}, {"epoch": epoch})

    _export(ema, cfg, opt)


def _export(params, cfg, opt):
    from sealdnerf_tpu.utils.meshing import extract_geometry, save_ply
    out = os.path.join(opt.workspace, "results", "output.ply")
    os.makedirs(os.path.dirname(out), exist_ok=True)

    def query(pts):
        return -np.asarray(sdf_forward(params, cfg, jnp.asarray(pts)))

    verts, tris = extract_geometry(np.array([-1.0] * 3), np.array([1.0] * 3),
                                   opt.mesh_resolution, 0.0, query)
    save_ply(out, verts, tris)
    print(f"saved {out} ({len(verts)} verts)")


def _make_sphere_mesh(path, res=24):
    from sealdnerf_tpu.utils.meshing import save_ply
    from sealdnerf_tpu.utils.native import load_native
    g = np.stack(np.meshgrid(*[np.linspace(-1, 1, res)] * 3, indexing="ij"),
                 -1)
    field = (0.55 - np.linalg.norm(g, axis=-1)).astype(np.float32)
    native = load_native()
    verts, tris = native.marching_tetrahedra(field, 0.0)
    verts = verts * (2.0 / (res - 1)) - 1.0
    save_ply(path, verts, tris)


if __name__ == "__main__":
    main()
