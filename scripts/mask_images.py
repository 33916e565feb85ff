#!/usr/bin/env python3
"""Apply mask images as alpha for dynamic-object removal (reference
scripts/mask_images.py): for each frame with a mask, nonzero mask pixels
are written as `dynamic_mask_<name>.png` next to the image, which the
NeRF loader turns into ignored (hot-pink) training pixels."""

import argparse
import glob
import os

import numpy as np
from PIL import Image


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("image_dir")
    p.add_argument("mask_dir",
                   help="masks named like their images; white = masked")
    p.add_argument("--threshold", type=int, default=127)
    args = p.parse_args()

    for mask_path in sorted(glob.glob(os.path.join(args.mask_dir, "*"))):
        name = os.path.splitext(os.path.basename(mask_path))[0]
        matches = glob.glob(os.path.join(args.image_dir, name + ".*"))
        if not matches:
            continue
        mask = np.asarray(Image.open(mask_path).convert("L"))
        out = (mask > args.threshold).astype(np.uint8) * 255
        out_path = os.path.join(args.image_dir, f"dynamic_mask_{name}.png")
        Image.fromarray(out).save(out_path)
        print("wrote", out_path)


if __name__ == "__main__":
    main()
