"""Drive: band-anchor sanity + bucketed subsampling on the real TPU.

Trains the bench's static CP recipe to ~800 steps, then scores the
center band three ways:
  a) rows of the full-image render (the new bench anchor -- exact),
  b) a band-crop render through the bucketed renderer (the old anchor
     that read an impossible 15.58),
  c) a band-crop render through the plain tiled renderer (exact crop).
Success: (a) ~= (c), and full-image PSNR <= (a) + 6 dB; (b) should now
be within ~1 dB of (c) thanks to interval subsampling instead of
truncation.
"""
import time

import numpy as np

from sealdnerf_tpu.utils.jaxsetup import setup_jax
setup_jax()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from sealdnerf_tpu.data.synthetic import make_synthetic_scene  # noqa: E402
from sealdnerf_tpu.models.cp import CPConfig, make_cp_field  # noqa: E402
from sealdnerf_tpu.train.trainer import TrainOptions  # noqa: E402
from sealdnerf_tpu.train.fast import FastTrainer  # noqa: E402


def psnr(img, gtimg):
    gt = gtimg[..., :3] * gtimg[..., 3:] + (1 - gtimg[..., 3:])
    return -10 * np.log10(max(np.mean((np.clip(img, 0, 1) - gt) ** 2),
                              1e-10))


def main():
    _, train, val = make_synthetic_scene(n_train=24, n_val=2, res=256,
                                         hard=True)
    opt = TrainOptions(iters=1200, num_rays=4096, bound=1.0, dt_gamma=0.0,
                       grid_size=128, march_res=64, n_intervals=16,
                       steps_per_interval=4, segment_steps=128,
                       workspace="/tmp/drive_band")
    field = make_cp_field(jax.random.PRNGKey(0), CPConfig(bound=1.0))
    tr = FastTrainer("driveband", opt, field, workspace="/tmp/drive_band",
                     use_checkpoint="scratch")
    tr.mark_untrained_grid(train.poses, train.intrinsics)
    data = train.device()
    h, w, c, n = train.h, train.w, train.images.shape[-1], len(train)
    t0 = time.perf_counter()
    while tr.global_step < 800:
        m = tr.train_segment(data, h, w, c, n, 128)
    _ = float(m["loss"])
    print(f"trained to {tr.global_step} in {time.perf_counter()-t0:.0f}s, "
          f"use_buckets={tr._use_buckets()}")

    r0, r1 = 96, 160
    gt_band = val.images[0][r0:r1]
    full, _ = tr.render_image(val.poses[0], val.intrinsics, val.h, val.w)
    p_full = psnr(full, val.images[0])
    p_band_rows = psnr(full[r0:r1], gt_band)

    intr_b = np.asarray(val.intrinsics, np.float32).copy()
    intr_b[3] -= r0
    band_bkt, _ = tr.render_image(val.poses[0], intr_b, r1 - r0, val.w)

    # plain tiled crop (exact): force the buckets=False renderer
    tp = opt.render_tile_px
    key = (r1 - r0, val.w, tp, False, "rgb8")
    if key not in tr._renderers:
        tr._renderers[key] = tr._build_renderer(r1 - r0, val.w, tp,
                                                buckets=False)
    cam = np.empty(24, np.float32)
    cam[:16] = np.asarray(val.poses[0], np.float32).reshape(-1)[:16]
    cam[16:20] = intr_b
    cam[20:23] = 1.0
    cam[23] = 0.0
    out = tr._renderers[key](tr._infer_params(), tr.grid_state["occ"],
                             jnp.asarray(cam))
    band_tiled, _ = tr._unpack_frame(np.asarray(out))

    p_bkt = psnr(band_bkt, gt_band)
    p_tiled = psnr(band_tiled, gt_band)
    print(f"full image PSNR          : {p_full:.2f}")
    print(f"band from full rows      : {p_band_rows:.2f}")
    print(f"band crop, tiled (exact) : {p_tiled:.2f}")
    print(f"band crop, bucketed      : {p_bkt:.2f}")
    assert p_full <= p_band_rows + 6.03, "impossible band/full pair"
    assert abs(p_band_rows - p_tiled) < 0.3, "crop render != full rows"
    print("OK" if p_bkt > p_tiled - 1.5 else
          "WARN: bucketed band still >1.5 dB under exact crop")


if __name__ == "__main__":
    main()
