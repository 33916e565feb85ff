#!/usr/bin/env python3
"""NeRFCapture app export → transforms.json (reference
scripts/nerfcapture2nerf.py, offline part). The app already writes a
transforms.json-like manifest; this normalizes field names, optionally
rescales depth, and sets aabb_scale."""

import argparse
import json
import os


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("capture_dir")
    p.add_argument("--aabb_scale", type=int, default=16)
    p.add_argument("--depth_scale", type=float, default=0.0,
                   help="integer_depth_scale for depth supervision")
    p.add_argument("--out", default="")
    args = p.parse_args()

    src = os.path.join(args.capture_dir, "transforms.json")
    with open(src) as f:
        data = json.load(f)
    data["aabb_scale"] = args.aabb_scale
    if args.depth_scale > 0:
        data["integer_depth_scale"] = args.depth_scale
        data["enable_depth_loading"] = True
    for fr in data.get("frames", []):
        # the app writes absolute paths sometimes; make them relative
        fr["file_path"] = os.path.relpath(
            fr["file_path"], args.capture_dir) \
            if os.path.isabs(fr["file_path"]) else fr["file_path"]
    out = args.out or src
    with open(out, "w") as f:
        json.dump(data, f, indent=2)
    print(f"wrote {out} ({len(data.get('frames', []))} frames)")


if __name__ == "__main__":
    main()
