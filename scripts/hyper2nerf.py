"""HyperNeRF dataset -> transforms.json converter (capability of reference
scripts/hyper2nerf.py, re-implemented from the Nerfies/HyperNeRF dataset
layout: scene.json + metadata.json + dataset.json + camera/<id>.json, images
under rgb/<scale>x/). Emits per-frame `time` (normalized warp id)."""

import argparse
import json
import os

import numpy as np


def convert(path, downscale=2):
    with open(os.path.join(path, "scene.json")) as f:
        scene = json.load(f)
    with open(os.path.join(path, "metadata.json")) as f:
        meta = json.load(f)
    with open(os.path.join(path, "dataset.json")) as f:
        dataset = json.load(f)

    ids = dataset["ids"]
    center = np.asarray(scene.get("center", [0, 0, 0]))
    scale = float(scene.get("scale", 1.0))

    max_time = max(int(meta[i].get("warp_id", meta[i].get("time_id", 0)))
                   for i in ids) or 1

    frames = []
    fl = cx = cy = w = h = None
    for i in ids:
        with open(os.path.join(path, "camera", f"{i}.json")) as f:
            cam = json.load(f)
        orient = np.asarray(cam["orientation"])  # world2cam rotation
        pos = np.asarray(cam["position"])
        c2w = np.eye(4)
        c2w[:3, :3] = orient.T
        # nerfies cam: [right down forward] -> nerf [right up back]
        c2w[:3, 1] *= -1
        c2w[:3, 2] *= -1
        c2w[:3, 3] = (pos - center) * scale
        t = int(meta[i].get("warp_id", meta[i].get("time_id", 0))) / max_time
        frames.append({
            "file_path": os.path.join("rgb", f"{downscale}x", f"{i}.png"),
            "time": t,
            "transform_matrix": c2w.tolist(),
        })
        if fl is None:
            fl = cam["focal_length"] / downscale
            cx = cam["principal_point"][0] / downscale
            cy = cam["principal_point"][1] / downscale
            w = cam["image_size"][0] / downscale
            h = cam["image_size"][1] / downscale

    out = {"fl_x": fl, "fl_y": fl, "cx": cx, "cy": cy, "w": int(w),
           "h": int(h), "frames": frames}
    with open(os.path.join(path, "transforms.json"), "w") as f:
        json.dump(out, f, indent=2)
    print(f"wrote {len(frames)} frames -> {path}/transforms.json")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("path")
    ap.add_argument("--downscale", type=int, default=2)
    args = ap.parse_args()
    convert(args.path, args.downscale)
