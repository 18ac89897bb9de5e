"""COLMAP -> transforms.json converter (capability of reference
scripts/colmap2nerf.py, re-implemented from the COLMAP text-model spec).

Reads cameras.txt + images.txt (COLMAP text export), converts quaternion
world2cam poses to cam2world, recenters the scene at the mean camera-ray
closest point, scales to the unit region, scores image sharpness (variance of
Laplacian), and writes transforms.json. Optionally runs colmap / ffmpeg
first when --run_colmap / --video are given (requires those binaries).
"""

import argparse
import json
import math
import os
import subprocess

import numpy as np


def qvec2rotmat(q):
    w, x, y, z = q
    return np.array([
        [1 - 2 * y * y - 2 * z * z, 2 * x * y - 2 * z * w,
         2 * x * z + 2 * y * w],
        [2 * x * y + 2 * z * w, 1 - 2 * x * x - 2 * z * z,
         2 * y * z - 2 * x * w],
        [2 * x * z - 2 * y * w, 2 * y * z + 2 * x * w,
         1 - 2 * x * x - 2 * y * y],
    ])


def sharpness(path):
    try:
        import cv2
        img = cv2.imread(path, cv2.IMREAD_GRAYSCALE)
        if img is None:
            return 0.0
        return float(cv2.Laplacian(img, cv2.CV_64F).var())
    except Exception:
        return 0.0


def closest_point_2_lines(oa, da, ob, db):
    """Point minimizing distance to two rays (for scene centering)."""
    da = da / np.linalg.norm(da)
    db = db / np.linalg.norm(db)
    c = np.cross(da, db)
    denom = np.linalg.norm(c) ** 2
    t = ob - oa
    ta = np.linalg.det([t, db, c]) / (denom + 1e-10)
    tb = np.linalg.det([t, da, c]) / (denom + 1e-10)
    ta, tb = max(ta, 0), max(tb, 0)
    return (oa + ta * da + ob + tb * db) * 0.5, denom


def convert(args):
    text = args.text
    cam_path = os.path.join(text, "cameras.txt")
    img_path = os.path.join(text, "images.txt")

    # intrinsics
    with open(cam_path) as f:
        cam = None
        for line in f:
            if line.startswith("#"):
                continue
            parts = line.split()
            model, w, h = parts[1], float(parts[2]), float(parts[3])
            p = [float(v) for v in parts[4:]]
            if model == "SIMPLE_PINHOLE":
                fl_x = fl_y = p[0]; cx, cy = p[1], p[2]; k1 = k2 = p1 = p2 = 0
            elif model == "PINHOLE":
                fl_x, fl_y, cx, cy = p[:4]; k1 = k2 = p1 = p2 = 0
            elif model in ("SIMPLE_RADIAL", "RADIAL"):
                fl_x = fl_y = p[0]; cx, cy = p[1], p[2]
                k1 = p[3]; k2 = p[4] if model == "RADIAL" else 0; p1 = p2 = 0
            elif model == "OPENCV":
                fl_x, fl_y, cx, cy, k1, k2, p1, p2 = p[:8]
            else:
                raise ValueError(f"unsupported camera model {model}")
            cam = dict(w=w, h=h, fl_x=fl_x, fl_y=fl_y, cx=cx, cy=cy,
                       k1=k1, k2=k2, p1=p1, p2=p2)
            break

    frames = []
    with open(img_path) as f:
        i = 0
        for line in f:
            if line.startswith("#") or not line.strip():
                continue
            i += 1
            if i % 2 == 0:  # every other line is 2D points
                continue
            parts = line.split()
            qvec = np.array([float(v) for v in parts[1:5]])
            tvec = np.array([float(v) for v in parts[5:8]])
            name = "_".join(parts[9:])
            r = qvec2rotmat(qvec)
            m = np.eye(4)
            m[:3, :3] = r
            m[:3, 3] = tvec
            c2w = np.linalg.inv(m)
            # colmap [right down forward] -> nerf [right up back]
            c2w[0:3, 1] *= -1
            c2w[0:3, 2] *= -1
            fp = os.path.join(args.images, name)
            frames.append({
                "file_path": fp,
                "sharpness": sharpness(os.path.join(args.path, fp)),
                "transform_matrix": c2w,
            })

    # recenter at the mean rays-closest point (instant-ngp convention)
    totw, totp = 0.0, np.zeros(3)
    for fa in frames:
        ma = fa["transform_matrix"]
        for fb in frames:
            mb = fb["transform_matrix"]
            p, w = closest_point_2_lines(ma[:3, 3], -ma[:3, 2],
                                         mb[:3, 3], -mb[:3, 2])
            if w > 0.01:
                totp += p * w
                totw += w
    center = totp / max(totw, 1e-9)
    avglen = 0.0
    for fr in frames:
        fr["transform_matrix"][:3, 3] -= center
        avglen += np.linalg.norm(fr["transform_matrix"][:3, 3])
    avglen /= max(len(frames), 1)
    for fr in frames:
        fr["transform_matrix"][:3, 3] *= 4.0 / max(avglen, 1e-9)
        fr["transform_matrix"] = fr["transform_matrix"].tolist()

    frames.sort(key=lambda fr: fr["file_path"])
    if args.skip_early:
        frames = frames[int(args.skip_early):]
    if args.dynamic:
        # per-frame time from the (sorted) frame index, normalized to
        # [0, 1] (reference colmap2nerf.py:320-323 --dynamic)
        for i, fr in enumerate(frames):
            fr["time"] = i / max(len(frames) - 1, 1)

    def write_json(name, frs):
        out = dict(
            camera_angle_x=2 * math.atan(cam["w"] / (2 * cam["fl_x"])),
            camera_angle_y=2 * math.atan(cam["h"] / (2 * cam["fl_y"])),
            fl_x=cam["fl_x"], fl_y=cam["fl_y"], cx=cam["cx"], cy=cam["cy"],
            w=int(cam["w"]), h=int(cam["h"]),
            k1=cam["k1"], k2=cam["k2"], p1=cam["p1"], p2=cam["p2"],
            aabb_scale=args.aabb_scale, frames=frs)
        with open(os.path.join(args.path, name), "w") as f:
            json.dump(out, f, indent=2)
        print(f"wrote {len(frs)} frames -> {args.path}/{name}")

    if args.hold <= 0:
        write_json("transforms.json", frames)
    else:
        # every hold-th image held out; val = every 10th of the test set
        # (reference colmap2nerf.py:354-368)
        test_ids = set(range(0, len(frames), args.hold))
        frames_train = [f for i, f in enumerate(frames)
                        if i not in test_ids]
        frames_test = [f for i, f in enumerate(frames) if i in test_ids]
        write_json("transforms_train.json", frames_train)
        write_json("transforms_val.json", frames_test[::10] or frames_test)
        write_json("transforms_test.json", frames_test)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("path", nargs="?", default=".")
    ap.add_argument("--text", default="colmap_text",
                    help="COLMAP text model dir")
    ap.add_argument("--images", default="images")
    ap.add_argument("--aabb_scale", type=int, default=4)
    ap.add_argument("--video", default=None,
                    help="extract frames from video first (needs ffmpeg)")
    ap.add_argument("--video_fps", type=int, default=2)
    ap.add_argument("--time_slice", default="",
                    help="'t1,t2' seconds of video to use "
                         "(reference colmap2nerf.py:35)")
    ap.add_argument("--run_colmap", action="store_true")
    ap.add_argument("--colmap_matcher", default="sequential",
                    choices=["exhaustive", "sequential", "spatial",
                             "transitive", "vocab_tree"])
    ap.add_argument("--estimate_affine_shape", action="store_true",
                    help="SiftExtraction option (CPU-only, better quality)")
    ap.add_argument("--dynamic", action="store_true",
                    help="save per-frame time from the frame index")
    ap.add_argument("--hold", type=int, default=0,
                    help="hold out every Nth image for test/val "
                         "(writes transforms_{train,val,test}.json)")
    ap.add_argument("--skip_early", type=int, default=0)
    args = ap.parse_args()
    args.text = os.path.join(args.path, args.text)

    if args.video:
        img_dir = os.path.join(args.path, args.images)
        os.makedirs(img_dir, exist_ok=True)
        vf = f"fps={args.video_fps}"
        if args.time_slice:
            t1, t2 = args.time_slice.split(",")
            vf += f",select='between(t\\,{t1}\\,{t2})'"
        subprocess.run(["ffmpeg", "-i", args.video, "-qscale:v", "1",
                        "-qmin", "1", "-vf", vf,
                        os.path.join(img_dir, "%04d.jpg")], check=True)
    if args.run_colmap:
        db = os.path.join(args.path, "colmap.db")
        fe = ["colmap", "feature_extractor", "--database_path", db,
              "--image_path", os.path.join(args.path, args.images)]
        if args.estimate_affine_shape:
            fe += ["--SiftExtraction.estimate_affine_shape", "true",
                   "--SiftExtraction.domain_size_pooling", "true"]
        subprocess.run(fe, check=True)
        subprocess.run(["colmap", f"{args.colmap_matcher}_matcher",
                        "--database_path", db], check=True)
        sparse = os.path.join(args.path, "sparse")
        os.makedirs(sparse, exist_ok=True)
        subprocess.run(["colmap", "mapper", "--database_path", db,
                        "--image_path",
                        os.path.join(args.path, args.images),
                        "--output_path", sparse], check=True)
        os.makedirs(args.text, exist_ok=True)
        subprocess.run(["colmap", "model_converter", "--input_path",
                        os.path.join(sparse, "0"), "--output_path", args.text,
                        "--output_type", "TXT"], check=True)
    convert(args)


if __name__ == "__main__":
    main()
