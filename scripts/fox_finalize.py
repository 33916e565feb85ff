#!/usr/bin/env python3
"""Final fox artifacts: train N steps, save a snapshot, render a view.

Companion to fox_convergence.py for when a tunnel wedge kills the
timeline run before its final render: one straight training run, then
the committed artifacts (fox.ingp snapshot + fox_view0.png + a
spp-4 PSNR) in a single process.

Usage: python scripts/fox_finalize.py --out-dir walkthrough_out
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out-dir", default="walkthrough_out")
    ap.add_argument("--scene",
                    default="/root/reference/data/nerf/fox/transforms.json")
    ap.add_argument("--steps", type=int, default=2048)
    ap.add_argument("--view", type=int, default=0)
    args = ap.parse_args()

    import numpy as np

    from instant_ngp_tpu.data.images import write_image
    from instant_ngp_tpu.testbed import Testbed

    tb = Testbed()
    tb.load_training_data(args.scene)
    tb.reload_network_from_file("base.json")
    tb.impl.rays_per_batch = 1 << 11
    tb.impl.adapt_ray_batch = False

    os.makedirs(args.out_dir, exist_ok=True)
    tb.train(1)  # compile outside the timed run
    t0 = time.perf_counter()
    tb.train(args.steps - 1)
    t_train = time.perf_counter() - t0
    print(f"trained {args.steps} steps in {t_train:.1f}s "
          f"({(args.steps - 1) / t_train:.2f} steps/s)", flush=True)

    snap = os.path.join(args.out_dir, "fox.ingp")
    tb.save_snapshot(snap)
    print("wrote", snap, flush=True)

    psnr = tb.impl.eval_psnr(args.view, spp=4, downscale=2)
    print(f"view {args.view} PSNR (spp 4, downscale 2): {psnr:.3f}",
          flush=True)
    img = tb.impl.render_training_view(args.view, spp=4,
                                       width=540, height=960)
    png = os.path.join(args.out_dir, "fox_view0.png")
    write_image(png, np.clip(img[..., :3], 0, 1).astype(np.float32))
    print("wrote", png)
    with open(os.path.join(args.out_dir, "fox_final.json"), "w") as f:
        json.dump({"steps": args.steps, "train_time_s": round(t_train, 2),
                   "steps_per_s": round((args.steps - 1) / t_train, 3),
                   "view": args.view, "psnr_spp4_ds2": round(psnr, 3)}, f,
                  indent=1)


if __name__ == "__main__":
    main()
