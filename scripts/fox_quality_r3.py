#!/usr/bin/env python3
"""Fox quality evidence at the reference operating point (VERDICT r2 #3).

Two training arms on the fox capture:
  default - configs/nerf/base.json as shipped (axis-exact j=1 forward +
            stochastic backward estimator), trained to --steps.
  exact   - identical but stochastic_corners=False (the reference's
            semantics: every corner, every step), trained to --ab-steps
            for the estimator A/B.

Evidence per arm (all full-resolution 1080x1920, spp 8, 8 fixed views,
eval_test_transforms semantics: black bg, min transmittance 1e-4, sRGB):
  - full eval at --ab-steps (both arms: the estimator A/B point)
  - full eval at --steps (default arm: the converged point)
  - cheap timeline evals at milestones, BOTH protocols (downscale 4 AND
    full-res, spp 2, 2 views) so the PSNR-vs-time curve and the
    protocol gap (ds4 vs full-res at the same step) are both on record.
    NOTE: entries written by the pre-change script lack psnr_full_avg —
    consumers must read entry.get("psnr_full_avg").

SUPERSEDED by fox_quality_r4.py (adds explicit not-run markers, PNG
before the full-eval record, wavefront-renderer evals).

Writes walkthrough_out/fox_quality_r3.json + fox_view0_r3.png, keeps a
resume snapshot per arm (the tunneled TPU can wedge a process for tens
of minutes; --resume continues from the last milestone).

Reference workflow being matched: README.md:5 fox; scripts/run.py
--n_steps 35000 default, test renders at spp 8 (run.py:179,228).
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

REPO = os.path.join(os.path.dirname(__file__), "..")
EVAL_VIEWS = [0, 8, 16, 24, 32, 40, 48, 56]


def load_json(path):
    if os.path.isfile(path):
        with open(path) as f:
            return json.load(f)
    return None


def run_arm(arm: str, steps: int, milestones, report: dict, args) -> None:
    import numpy as np

    from instant_ngp_tpu.data.images import write_image
    from instant_ngp_tpu.eval import eval_nerf_views
    from instant_ngp_tpu.testbed import Testbed

    snap = os.path.join(args.out_dir, f"fox_r3_{arm}_resume.ingp")
    tb = Testbed()
    tb.load_training_data(args.scene)
    rec = report["arms"].setdefault(arm, {"timeline": [], "full_eval": {}})
    t_train = rec["timeline"][-1]["train_time_s"] if rec["timeline"] else 0.0
    trained = rec["timeline"][-1]["step"] if rec["timeline"] else 0

    if args.resume and trained > 0 and os.path.isfile(snap):
        tb.load_snapshot(snap)
        print(f"[{arm}] resumed at step {trained}", flush=True)
    else:
        tb.reload_network_from_file("base.json")
        rec["timeline"], rec["full_eval"] = [], {}
        t_train, trained = 0.0, 0
    impl = tb.impl
    impl.rays_per_batch = 1 << 11
    impl.adapt_ray_batch = False
    if arm == "exact":
        impl.stochastic_corners = False

    tb.train(1)   # compile warm-up outside the timed window
    trained = max(trained, impl.training_step)

    for ms in milestones:
        if ms > steps:
            break
        if ms > trained:
            t0 = time.perf_counter()
            tb.train(ms - trained)
            t_train += time.perf_counter() - t0
            trained = ms
            # cheap timeline point, BOTH protocols: ds4 (area-averaged GT
            # vs a 2-spp point-sampled render — expected to fall as the
            # model sharpens) and full-res (the honest trajectory). The
            # pair on every milestone is the protocol-ceiling evidence.
            psnrs = [impl.eval_psnr(v, spp=2, downscale=4)
                     for v in (0, 30)]
            psnrs_full = [impl.eval_psnr(v, spp=2, downscale=1)
                          for v in (0, 30)]
            entry = {"step": ms, "train_time_s": round(t_train, 2),
                     "psnr_ds4_avg": round(float(np.mean(psnrs)), 3),
                     "psnr_full_avg": round(float(np.mean(psnrs_full)), 3),
                     "loss": round(tb.loss, 6)}
            rec["timeline"].append(entry)
            print(f"[{arm}]", entry, flush=True)
            tb.save_snapshot(snap)
            save(report, args)
        if str(ms) not in rec["full_eval"] and (
                ms == steps or ms == args.ab_steps):
            if arm == "default":
                # PNG BEFORE the full_eval record lands so an
                # interrupted-then-resumed run cannot skip it
                img = impl.render_training_view(0, spp=4, width=540,
                                                height=960)
                png = os.path.join(args.out_dir, "fox_view0_r3.png")
                write_image(png, np.clip(img[..., :3], 0,
                                         1).astype(np.float32))
                print("wrote", png, flush=True)
            print(f"[{arm}] full-res spp-8 eval at {ms}...", flush=True)
            t0 = time.perf_counter()
            ev = eval_nerf_views(impl, indices=EVAL_VIEWS, spp=8,
                                 downscale=1)
            ev["eval_wall_s"] = round(time.perf_counter() - t0, 1)
            rec["full_eval"][str(ms)] = {
                k: (round(v, 4) if isinstance(v, float) else
                    [round(x, 3) for x in v])
                for k, v in ev.items()}
            save(report, args)


def save(report, args):
    with open(os.path.join(args.out_dir, "fox_quality_r3.json"), "w") as f:
        json.dump(report, f, indent=1)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out-dir", default=os.path.join(REPO,
                                                      "walkthrough_out"))
    ap.add_argument("--scene",
                    default="/root/reference/data/nerf/fox/transforms.json")
    ap.add_argument("--steps", type=int, default=10240)
    ap.add_argument("--ab-steps", type=int, default=2048,
                    help="step at which both arms get the full eval")
    ap.add_argument("--arms", nargs="*", default=["default", "exact"])
    ap.add_argument("--resume", action="store_true")
    args = ap.parse_args()

    import jax

    os.makedirs(args.out_dir, exist_ok=True)
    path = os.path.join(args.out_dir, "fox_quality_r3.json")
    report = (load_json(path) if args.resume else None) or {
        "scene": "fox (real capture, OpenCV lens, 67 views; no test "
                 "split - train-view eval like reference run.py)",
        "backend": jax.default_backend(),
        "eval_protocol": {"views": EVAL_VIEWS, "spp": 8, "downscale": 1,
                          "min_transmittance": 1e-4, "bg": "black",
                          "note": "eval_test_transforms semantics"},
        "arms": {},
    }
    milestones = [256, 512, 1024, 2048, 3072, 4096, 6144, 8192, 10240]
    for arm in args.arms:
        steps = args.steps if arm == "default" else args.ab_steps
        run_arm(arm, steps, milestones, report, args)
    save(report, args)
    print("wrote", path)


if __name__ == "__main__":
    main()
