"""LLFF -> transforms.json converter (capability of reference
scripts/llff2nerf.py, re-implemented from the LLFF format spec).

LLFF stores poses_bounds.npy [N, 17]: a 3x5 matrix ([R | t | (H, W, focal)])
per image in [down, right, back] axis convention plus near/far bounds. NeRF's
transforms.json wants cam2world in [right, up, back] with a shared intrinsic.
"""

import argparse
import glob
import json
import os

import numpy as np


def convert(path, images="images", downscale=1, hold=8):
    pb = np.load(os.path.join(path, "poses_bounds.npy"))  # [N, 17]
    poses = pb[:, :15].reshape(-1, 3, 5)
    h, w, focal = poses[0, :, 4]
    h, w, focal = h / downscale, w / downscale, focal / downscale

    # [down right back] -> [right up back]: columns (r1, -r0, r2)
    c2w = np.tile(np.eye(4), (len(poses), 1, 1))
    c2w[:, :3, 0] = poses[:, :, 1]
    c2w[:, :3, 1] = -poses[:, :, 0]
    c2w[:, :3, 2] = poses[:, :, 2]
    c2w[:, :3, 3] = poses[:, :, 3]

    img_paths = sorted(
        glob.glob(os.path.join(path, images, "*.jpg"))
        + glob.glob(os.path.join(path, images, "*.png"))
        + glob.glob(os.path.join(path, images, "*.JPG")))
    assert len(img_paths) == len(poses), \
        f"{len(img_paths)} images vs {len(poses)} poses"

    frames = []
    for i, p in enumerate(img_paths):
        frames.append({
            "file_path": os.path.relpath(p, path),
            "transform_matrix": c2w[i].tolist(),
        })
    out = {
        "fl_x": focal, "fl_y": focal, "cx": w / 2, "cy": h / 2,
        "h": int(h), "w": int(w),
        "aabb_scale": 4,
        "frames": frames,
    }
    with open(os.path.join(path, "transforms.json"), "w") as f:
        json.dump(out, f, indent=2)
    print(f"wrote {len(frames)} frames -> {path}/transforms.json")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("path")
    ap.add_argument("--images", default="images")
    ap.add_argument("--downscale", type=int, default=1)
    args = ap.parse_args()
    convert(args.path, args.images, args.downscale)
