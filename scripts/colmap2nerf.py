#!/usr/bin/env python3
"""COLMAP → transforms.json converter (reference scripts/colmap2nerf.py).

Reads a COLMAP text model (cameras.txt + images.txt), converts camera
poses into the NeRF convention the loader expects, estimates per-frame
sharpness, recenters the scene on the cameras' common point of attention,
and scales so the average camera distance is 4 (the "NeRF-sized" scene
that aabb_scale then subdivides). Can optionally run COLMAP itself on a
directory of images or a video (requires colmap/ffmpeg binaries).
"""

import argparse
import json
import math
import os
import shutil
import subprocess
import sys

import numpy as np


def parse_args():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--video_in", default="",
                   help="video to extract frames from (needs ffmpeg)")
    p.add_argument("--video_fps", type=float, default=2.0)
    p.add_argument("--run_colmap", action="store_true",
                   help="run colmap feature extraction + mapping")
    p.add_argument("--colmap_matcher", default="sequential",
                   choices=["exhaustive", "sequential", "spatial",
                            "transitive", "vocab_tree"])
    p.add_argument("--colmap_db", default="colmap.db")
    p.add_argument("--colmap_camera_model", default="OPENCV")
    p.add_argument("--images", default="images")
    p.add_argument("--text", default="colmap_text",
                   help="COLMAP text model folder (cameras.txt/images.txt)")
    p.add_argument("--aabb_scale", type=int, default=32,
                   choices=[1, 2, 4, 8, 16, 32, 64, 128])
    p.add_argument("--skip_early", type=int, default=0)
    p.add_argument("--keep_colmap_coords", action="store_true")
    p.add_argument("--out", default="transforms.json")
    return p.parse_args()


def sharpness(image_path: str) -> float:
    """Variance of the Laplacian — same blur metric as the reference."""
    import cv2

    img = cv2.imread(image_path)
    if img is None:
        return 1.0
    gray = cv2.cvtColor(img, cv2.COLOR_BGR2GRAY)
    return float(cv2.Laplacian(gray, cv2.CV_64F).var())


def qvec2rotmat(q):
    w, x, y, z = q
    return np.array([
        [1 - 2 * y * y - 2 * z * z, 2 * x * y - 2 * z * w,
         2 * x * z + 2 * y * w],
        [2 * x * y + 2 * z * w, 1 - 2 * x * x - 2 * z * z,
         2 * y * z - 2 * x * w],
        [2 * x * z - 2 * y * w, 2 * y * z + 2 * x * w,
         1 - 2 * x * x - 2 * y * y]])


def rotmat_between(a, b):
    """Rotation carrying unit vector a onto b (Rodrigues)."""
    a = a / np.linalg.norm(a)
    b = b / np.linalg.norm(b)
    v = np.cross(a, b)
    c = float(np.dot(a, b))
    if np.linalg.norm(v) < 1e-8:
        return np.eye(3) if c > 0 else -np.eye(3)
    K = np.array([[0, -v[2], v[1]], [v[2], 0, -v[0]], [-v[1], v[0], 0]])
    return np.eye(3) + K + K @ K * (1 / (1 + c))


def closest_point_2_lines(oa, da, ob, db):
    """Point minimizing distance to both rays + confidence weight."""
    da = da / np.linalg.norm(da)
    db = db / np.linalg.norm(db)
    c = np.cross(da, db)
    denom = np.linalg.norm(c) ** 2
    t = ob - oa
    ta = np.linalg.det([t, db, c]) / (denom + 1e-10)
    tb = np.linalg.det([t, da, c]) / (denom + 1e-10)
    ta, tb = max(ta, 0), max(tb, 0)
    return (oa + ta * da + ob + tb * db) * 0.5, denom


def parse_cameras(path: str):
    cameras = {}
    with open(path) as f:
        for line in f:
            if line.startswith("#") or not line.strip():
                continue
            els = line.split()
            cam = {"w": float(els[2]), "h": float(els[3]),
                   "fl_x": float(els[4]), "fl_y": float(els[4]),
                   "k1": 0.0, "k2": 0.0, "k3": 0.0, "k4": 0.0,
                   "p1": 0.0, "p2": 0.0, "is_fisheye": False,
                   "cx": float(els[2]) / 2, "cy": float(els[3]) / 2}
            model = els[1]
            if model == "SIMPLE_PINHOLE":
                cam["cx"], cam["cy"] = float(els[5]), float(els[6])
            elif model == "PINHOLE":
                cam["fl_y"] = float(els[5])
                cam["cx"], cam["cy"] = float(els[6]), float(els[7])
            elif model == "SIMPLE_RADIAL":
                cam["cx"], cam["cy"] = float(els[5]), float(els[6])
                cam["k1"] = float(els[7])
            elif model == "RADIAL":
                cam["cx"], cam["cy"] = float(els[5]), float(els[6])
                cam["k1"], cam["k2"] = float(els[7]), float(els[8])
            elif model == "OPENCV":
                cam["fl_y"] = float(els[5])
                cam["cx"], cam["cy"] = float(els[6]), float(els[7])
                cam["k1"], cam["k2"] = float(els[8]), float(els[9])
                cam["p1"], cam["p2"] = float(els[10]), float(els[11])
            elif model == "SIMPLE_RADIAL_FISHEYE":
                cam["is_fisheye"] = True
                cam["cx"], cam["cy"] = float(els[5]), float(els[6])
                cam["k1"] = float(els[7])
            elif model == "RADIAL_FISHEYE":
                cam["is_fisheye"] = True
                cam["cx"], cam["cy"] = float(els[5]), float(els[6])
                cam["k1"], cam["k2"] = float(els[7]), float(els[8])
            elif model == "OPENCV_FISHEYE":
                cam["is_fisheye"] = True
                cam["fl_y"] = float(els[5])
                cam["cx"], cam["cy"] = float(els[6]), float(els[7])
                cam["k1"], cam["k2"] = float(els[8]), float(els[9])
                cam["k3"], cam["k4"] = float(els[10]), float(els[11])
            else:
                print("unknown camera model", model)
            cam["camera_angle_x"] = 2 * math.atan(cam["w"]
                                                  / (2 * cam["fl_x"]))
            cam["camera_angle_y"] = 2 * math.atan(cam["h"]
                                                  / (2 * cam["fl_y"]))
            cameras[int(els[0])] = cam
    return cameras


def run_ffmpeg(args):
    os.makedirs(args.images, exist_ok=True)
    subprocess.run(["ffmpeg", "-i", args.video_in, "-qscale:v", "1",
                    "-qmin", "1", "-vf", f"fps={args.video_fps}",
                    os.path.join(args.images, "%04d.jpg")], check=True)


def run_colmap(args):
    subprocess.run(["colmap", "feature_extractor", "--ImageReader.camera_model",
                    args.colmap_camera_model, "--ImageReader.single_camera",
                    "1", "--database_path", args.colmap_db,
                    "--image_path", args.images], check=True)
    subprocess.run(["colmap", f"{args.colmap_matcher}_matcher",
                    "--database_path", args.colmap_db], check=True)
    os.makedirs("colmap_sparse", exist_ok=True)
    subprocess.run(["colmap", "mapper", "--database_path", args.colmap_db,
                    "--image_path", args.images, "--output_path",
                    "colmap_sparse"], check=True)
    os.makedirs(args.text, exist_ok=True)
    subprocess.run(["colmap", "model_converter", "--input_path",
                    "colmap_sparse/0", "--output_path", args.text,
                    "--output_type", "TXT"], check=True)


def main():
    args = parse_args()
    if args.video_in:
        run_ffmpeg(args)
    if args.run_colmap:
        run_colmap(args)

    cameras = parse_cameras(os.path.join(args.text, "cameras.txt"))
    if not cameras:
        sys.exit("no cameras found")

    single = len(cameras) == 1
    out = {"aabb_scale": args.aabb_scale, "frames": []}
    if single:
        out.update(next(iter(cameras.values())))

    up = np.zeros(3)
    bottom = np.array([[0, 0, 0, 1.0]])
    with open(os.path.join(args.text, "images.txt")) as f:
        i = 0
        for line in f:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            i += 1
            if i < args.skip_early * 2 or i % 2 == 0:
                continue  # every other line is 2D point observations
            els = line.split()
            name = os.path.join(args.images, "_".join(els[9:]))
            qvec = np.array(list(map(float, els[1:5])))
            tvec = np.array(list(map(float, els[5:8])))
            R = qvec2rotmat(-qvec)
            m = np.concatenate([np.concatenate(
                [R, tvec.reshape(3, 1)], 1), bottom], 0)
            c2w = np.linalg.inv(m)
            if not args.keep_colmap_coords:
                c2w[0:3, 2] *= -1
                c2w[0:3, 1] *= -1
                c2w = c2w[[1, 0, 2, 3], :]
                c2w[2, :] *= -1
                up += c2w[0:3, 1]
            frame = {"file_path": name, "sharpness": sharpness(name),
                     "transform_matrix": c2w}
            if not single:
                frame.update(cameras[int(els[8])])
            out["frames"].append(frame)

    n = len(out["frames"])
    if args.keep_colmap_coords:
        flip = np.diag([1, -1, -1, 1.0])
        for fr in out["frames"]:
            fr["transform_matrix"] = fr["transform_matrix"] @ flip
    else:
        up = up / np.linalg.norm(up)
        R = np.pad(rotmat_between(up, np.array([0, 0, 1.0])), [(0, 1),
                                                               (0, 1)])
        R[-1, -1] = 1
        for fr in out["frames"]:
            fr["transform_matrix"] = R @ fr["transform_matrix"]
        # center of attention: weighted closest point of all view rays
        totw, totp = 0.0, np.zeros(3)
        mats = [fr["transform_matrix"] for fr in out["frames"]]
        for mf in mats:
            for mg in mats:
                p, w = closest_point_2_lines(mf[0:3, 3], mf[0:3, 2],
                                             mg[0:3, 3], mg[0:3, 2])
                if w > 1e-5:
                    totp += p * w
                    totw += w
        if totw > 0:
            totp /= totw
        avglen = 0.0
        for fr in out["frames"]:
            fr["transform_matrix"][0:3, 3] -= totp
            avglen += np.linalg.norm(fr["transform_matrix"][0:3, 3])
        avglen /= max(n, 1)
        for fr in out["frames"]:
            fr["transform_matrix"][0:3, 3] *= 4.0 / avglen

    for fr in out["frames"]:
        fr["transform_matrix"] = fr["transform_matrix"].tolist()
    with open(args.out, "w") as f:
        json.dump(out, f, indent=2)
    print(f"wrote {args.out} with {n} frames")


if __name__ == "__main__":
    main()
