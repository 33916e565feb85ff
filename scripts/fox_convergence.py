#!/usr/bin/env python3
"""Fox PSNR-vs-time convergence record (BASELINE.md evidence artifact).

Trains the fox capture through the public Testbed facade, logging
wall-clock time and eval PSNR at step milestones, then writes a JSON
timeline plus a rendered view. The reference's bar: "train a NeRF model
of a fox in under 5 seconds" to *usable* quality on an RTX 3090
(README.md:5); docs/nerf_dataset_tips.md:11 calls ~20 s the
converged-or-never point.

Usage: python scripts/fox_convergence.py --out-dir walkthrough_out
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
    ap.add_argument("--milestones", type=int, nargs="*",
                    default=[64, 128, 256, 512, 1024, 1536, 2048])
    ap.add_argument("--eval-views", type=int, nargs="*", default=[0, 30])
    ap.add_argument("--eval-spp", type=int, default=1)
    # downscale 4 keeps the eval inside two cached 65k-ray tile
    # dispatches per view (the compiled tile fn is resolution-agnostic)
    ap.add_argument("--eval-downscale", type=int, default=4)
    ap.add_argument("--resume", action="store_true",
                    help="continue from the milestone snapshot if present")
    args = ap.parse_args()

    import jax
    import numpy as np

    from instant_ngp_tpu.data.images import write_image
    from instant_ngp_tpu.testbed import Testbed

    os.makedirs(args.out_dir, exist_ok=True)
    snap_path = os.path.join(args.out_dir, "fox_resume.ingp")
    json_path = os.path.join(args.out_dir, "fox_convergence.json")

    tb = Testbed()
    tb.load_training_data(args.scene)
    timeline = []
    t_train = 0.0
    trained = 1
    if args.resume and os.path.isfile(snap_path) \
            and os.path.isfile(json_path):
        # the tunneled TPU wedges single processes for 20-40+ min;
        # resuming from the last milestone snapshot loses nothing
        tb.load_snapshot(snap_path)
        with open(json_path) as f:
            prev = json.load(f)
        timeline = prev["timeline"]
        t_train = timeline[-1]["train_time_s"]
        trained = timeline[-1]["step"]
        print(f"resumed at step {trained} (t_train {t_train}s)",
              flush=True)
    else:
        tb.reload_network_from_file("base.json")
    impl = tb.impl
    impl.rays_per_batch = 1 << 11
    impl.adapt_ray_batch = False

    # warm the compile caches OUTSIDE the timed run (first-compile of the
    # train program costs minutes through the tunnel and is cached across
    # steps; the reference's 5 s figure also excludes CUDA compilation)
    tb.train(1)
    trained += 1 if trained > 1 else 0
    # train_time_s counts ONLY tb.train() wall time — milestone eval
    # renders are instrumentation and excluded, matching how the
    # reference's "fox in 5 s" figure is taken (training only)
    for ms in args.milestones:
        if ms <= trained:
            continue
        t0 = time.perf_counter()
        tb.train(ms - trained)
        t_train += time.perf_counter() - t0
        trained = ms
        psnrs = [impl.eval_psnr(v, spp=args.eval_spp,
                                downscale=args.eval_downscale)
                 for v in args.eval_views]
        entry = {
            "step": ms,
            "train_time_s": round(t_train, 2),
            "psnr_per_view": [round(p, 3) for p in psnrs],
            "psnr_avg": round(float(np.mean(psnrs)), 3),
            "loss": round(tb.loss, 6),
        }
        timeline.append(entry)
        print(entry, flush=True)

        # write incrementally — tunnel runs can die mid-flight and a
        # partial timeline is still evidence
        perf = tb.train_stats()
        out = {
            "scene": "fox (real capture, OpenCV lens)",
            "backend": jax.default_backend(),
            "eval": {"views": args.eval_views, "spp": args.eval_spp,
                     "downscale": args.eval_downscale,
                     "note": "PSNR in sRGB vs GT on black, run.py semantics"},
            "steps_per_s": round(perf.get("steps_per_s") or 0.0, 3),
            "samples_per_s": round(perf.get("samples_per_s") or 0.0, 1),
            "timeline": timeline,
        }
        with open(json_path, "w") as f:
            json.dump(out, f, indent=1)
        tb.save_snapshot(snap_path)   # resume point for wedge recovery
    print("wrote", json_path)

    img = impl.render_training_view(args.eval_views[0], spp=4,
                                    width=540, height=960)
    png = os.path.join(args.out_dir, "fox_view0.png")
    write_image(png, np.clip(img[..., :3], 0, 1).astype(np.float32))
    print("wrote", png)


if __name__ == "__main__":
    main()
