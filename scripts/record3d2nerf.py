#!/usr/bin/env python3
"""Record3D capture → transforms.json (reference scripts/record3d2nerf.py).

Record3D exports an EXR+JPG sequence with a metadata JSON containing
per-frame quaternion poses (ARKit convention: y up, z back — already the
NeRF convention) and the camera intrinsic matrix K."""

import argparse
import glob
import json
import math
import os

import numpy as np


def quat2mat(q):
    x, y, z, w = q  # Record3D stores xyzw
    return np.array([
        [1 - 2 * y * y - 2 * z * z, 2 * x * y - 2 * z * w,
         2 * x * z + 2 * y * w],
        [2 * x * y + 2 * z * w, 1 - 2 * x * x - 2 * z * z,
         2 * y * z - 2 * x * w],
        [2 * x * z - 2 * y * w, 2 * y * z + 2 * x * w,
         1 - 2 * x * x - 2 * y * y]])


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("capture_dir", help="Record3D export directory")
    p.add_argument("--aabb_scale", type=int, default=4)
    p.add_argument("--subsample", type=int, default=1)
    p.add_argument("--out", default="transforms.json")
    args = p.parse_args()

    with open(os.path.join(args.capture_dir, "metadata")) as f:
        meta = json.load(f)
    K = np.asarray(meta["K"]).reshape(3, 3).T
    poses = meta["poses"]  # [qx,qy,qz,qw, tx,ty,tz]
    w = meta.get("w", int(K[0, 2] * 2))
    h = meta.get("h", int(K[1, 2] * 2))

    images = sorted(glob.glob(os.path.join(args.capture_dir, "rgbd",
                                           "*.jpg")))
    out = {
        "fl_x": float(K[0, 0]), "fl_y": float(K[1, 1]),
        "cx": float(K[0, 2]), "cy": float(K[1, 2]), "w": w, "h": h,
        "camera_angle_x": 2 * math.atan(w / (2 * float(K[0, 0]))),
        "aabb_scale": args.aabb_scale,
        "frames": [],
    }
    for i, (pose, img) in enumerate(zip(poses, images)):
        if i % args.subsample:
            continue
        R = quat2mat(pose[:4])
        t = np.asarray(pose[4:7]).reshape(3, 1)
        m = np.concatenate([np.concatenate([R, t], 1),
                            [[0, 0, 0, 1.0]]], 0)
        out["frames"].append({
            "file_path": os.path.relpath(img, os.path.dirname(args.out)
                                         or "."),
            "transform_matrix": m.tolist(),
        })

    with open(args.out, "w") as f:
        json.dump(out, f, indent=2)
    print(f"wrote {args.out} with {len(out['frames'])} frames")


if __name__ == "__main__":
    main()
