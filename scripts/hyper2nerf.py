"""HyperNeRF dataset -> transforms_{train,val}.json converter (capability
of reference scripts/hyper2nerf.py, re-implemented from the
Nerfies/HyperNeRF dataset layout: scene.json + metadata.json +
dataset.json + camera/<id>.json, images under rgb/<scale>x/).

Matches the reference's world handling (hyper2nerf.py:150-199): colmap
axis swap, up-vector alignment to +z, recentering at the mean
ray-closest point, 4/avg-radius scaling, per-frame normalized `time`
from metadata time_id/warp_id, and the dataset.json train/val split
(val file keeps every 10th val frame).
"""

import argparse
import json
import os

import numpy as np


def rotmat(a, b):
    """Rotation taking unit vector a to unit vector b."""
    a = a / np.linalg.norm(a)
    b = np.asarray(b, dtype=np.float64)
    v = np.cross(a, b)
    c = float(np.dot(a, b))
    if np.linalg.norm(v) < 1e-8:
        return np.eye(3) if c > 0 else -np.eye(3)
    s = np.linalg.norm(v)
    k = np.array([[0, -v[2], v[1]], [v[2], 0, -v[0]], [-v[1], v[0], 0]])
    return np.eye(3) + k + k @ k * ((1 - c) / (s ** 2))


def closest_point_2_lines(oa, da, ob, db):
    da = da / np.linalg.norm(da)
    db = db / np.linalg.norm(db)
    c = np.cross(da, db)
    denom = np.linalg.norm(c) ** 2
    t = ob - oa
    ta = np.linalg.det([t, db, c]) / (denom + 1e-10)
    tb = np.linalg.det([t, da, c]) / (denom + 1e-10)
    ta, tb = max(ta, 0), max(tb, 0)
    return (oa + ta * da + ob + tb * db) * 0.5, denom


def convert(path, downscale=2):
    with open(os.path.join(path, "metadata.json")) as f:
        meta = json.load(f)
    with open(os.path.join(path, "dataset.json")) as f:
        dataset = json.load(f)

    ids = dataset["ids"]
    train_names = set(dataset.get("train_ids", ids))
    val_names = set(dataset.get("val_ids", []))

    poses, times, images = [], [], []
    fl = cx = cy = w = h = None
    for name in ids:
        with open(os.path.join(path, "camera", f"{name}.json")) as f:
            cam = json.load(f)
        orient = np.asarray(cam["orientation"])  # world2cam rotation
        pos = np.asarray(cam["position"])
        c2w = np.eye(4)
        c2w[:3, :3] = orient.T
        c2w[:3, 3] = pos
        poses.append(c2w)
        m = meta[name]
        times.append(float(m.get("time_id", m.get("warp_id", 0))))
        images.append(os.path.join("rgb", f"{downscale}x", f"{name}.png"))
        if fl is None:
            fl = cam["focal_length"] / downscale
            cx = cam["principal_point"][0] / downscale
            cy = cam["principal_point"][1] / downscale
            w = cam["image_size"][0] // downscale
            h = cam["image_size"][1] // downscale

    poses = np.stack(poses)                      # [N, 4, 4]
    times = np.asarray(times, dtype=np.float32)
    times = times / max(times.max(), 1.0)

    # world-convention fixes, as the reference (hyper2nerf.py:150-156)
    poses[:, 0:3, 1] *= -1
    poses[:, 0:3, 2] *= -1
    poses = poses[:, [1, 0, 2, 3], :]            # swap y and z
    poses[:, 2, :] *= -1                         # flip world upside down

    up = poses[:, 0:3, 1].sum(0)
    up = up / np.linalg.norm(up)
    r = np.pad(rotmat(up, [0, 0, 1]), [(0, 1), (0, 1)])
    r[-1, -1] = 1
    poses = r @ poses

    n = len(poses)
    totw, totp = 0.0, np.zeros(3)
    for i in range(n):
        mf = poses[i, :3, :]
        for j in range(i + 1, n):
            mg = poses[j, :3, :]
            p, wt = closest_point_2_lines(mf[:, 3], mf[:, 2],
                                          mg[:, 3], mg[:, 2])
            if wt > 0.01:
                totp += p * wt
                totw += wt
    if totw > 0:
        poses[:, :3, 3] -= totp / totw
    avglen = np.linalg.norm(poses[:, :3, 3], axis=-1).mean()
    poses[:, :3, 3] *= 4.0 / max(avglen, 1e-9)

    def frame(i):
        return {"file_path": images[i], "time": float(times[i]),
                "transform_matrix": poses[i].tolist()}

    frames_train = [frame(i) for i, name in enumerate(ids)
                    if name in train_names]
    frames_val = [frame(i) for i, name in enumerate(ids)
                  if name in val_names]

    def write_json(filename, frames):
        out = {"w": int(w), "h": int(h), "fl_x": fl, "fl_y": fl,
               "cx": cx, "cy": cy, "frames": frames}
        with open(os.path.join(path, filename), "w") as f:
            json.dump(out, f, indent=2)
        print(f"wrote {len(frames)} frames -> {path}/{filename}")

    write_json("transforms_train.json", frames_train)
    write_json("transforms_val.json", frames_val[::10] or frames_val
               or frames_train[::10])


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("path")
    ap.add_argument("--downscale", type=int, default=2,
                    help="image down scale, from [2, 4, 8, 16]")
    args = ap.parse_args()
    convert(args.path, args.downscale)
