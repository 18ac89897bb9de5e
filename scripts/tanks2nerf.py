"""Tanks&Temples (NSVF layout) -> transforms.json converter (capability of
reference scripts/tanks2nerf.py): intrinsics.txt + pose/*.txt + rgb/*.png,
with the NSVF train/val/test split encoded in the filename prefix
(0_=train, 1_=val, 2_=test)."""

import argparse
import glob
import json
import os

import numpy as np


def convert(path):
    intr = np.loadtxt(os.path.join(path, "intrinsics.txt"))
    if intr.ndim == 2:  # 4x4 intrinsic matrix
        fl_x, fl_y = intr[0, 0], intr[1, 1]
        cx, cy = intr[0, 2], intr[1, 2]
    else:
        fl_x = fl_y = intr[0]
        cx, cy = intr[1], intr[2]

    pose_files = sorted(glob.glob(os.path.join(path, "pose", "*.txt")))
    splits = {"0": [], "1": [], "2": []}
    h = w = None
    for pf in pose_files:
        name = os.path.splitext(os.path.basename(pf))[0]
        prefix = name.split("_")[0]
        c2w = np.loadtxt(pf).reshape(4, 4)
        # NSVF poses are cam2world [right down forward] -> [right up back]
        c2w[:3, 1] *= -1
        c2w[:3, 2] *= -1
        img = os.path.join("rgb", name + ".png")
        if h is None:
            try:
                import cv2
                im = cv2.imread(os.path.join(path, img))
                h, w = im.shape[:2]
            except Exception:
                h = w = None
        splits.setdefault(prefix, splits["0"]).append({
            "file_path": img, "transform_matrix": c2w.tolist()})

    names = {"0": "train", "1": "val", "2": "test"}
    for prefix, frames in splits.items():
        if not frames or prefix not in names:
            continue
        out = {"fl_x": float(fl_x), "fl_y": float(fl_y), "cx": float(cx),
               "cy": float(cy), "frames": frames}
        if h is not None:
            out["h"], out["w"] = int(h), int(w)
        fp = os.path.join(path, f"transforms_{names[prefix]}.json")
        with open(fp, "w") as f:
            json.dump(out, f, indent=2)
        print(f"wrote {len(frames)} frames -> {fp}")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("path")
    convert(ap.parse_args().path)
