#!/usr/bin/env python3
"""Image ↔ raw .bin gigapixel format converter (reference
scripts/convert_image.py). The .bin layout is int32 height, int32 width,
then h*w*4 float16 RGBA — the format the image testbed streams for
gigapixel fits."""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from instant_ngp_tpu.data.images import read_image, write_image


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("input")
    p.add_argument("output")
    args = p.parse_args()
    img = read_image(args.input)
    write_image(args.output, img)
    print(f"{args.input} {img.shape} -> {args.output}")


if __name__ == "__main__":
    main()
