#!/usr/bin/env python3
"""Fox quality evidence + PSNR-decay diagnosis (VERDICT r3 #2).

Two training arms on the fox capture:
  default - configs/nerf/base.json as shipped (axis-exact j=1 forward +
            stochastic backward estimator), trained to --steps.
  exact   - identical but stochastic_corners=False (the reference's
            semantics: every corner, every step), trained to --ab-steps
            for the estimator A/B.

Evidence per arm:
  - timeline at every milestone, BOTH protocols side by side:
      psnr_ds4_avg  : downscale-4, spp-2 (area-averaged GT vs
                      point-sampled render — expected to FALL as the
                      model sharpens; this was the only protocol the
                      round-3 run recorded, and its decay was
                      misattributed to training quality)
      psnr_full_avg : full-resolution 1080x1920, spp-2 (the honest
                      trajectory)
    The pair on every milestone IS the decay diagnosis: full-res
    rising while ds4 falls = protocol artifact; both falling = real
    estimator/training problem.
  - full evals (run.py --test_transforms semantics: full-res, spp 8,
    black bg, min transmittance 1e-4, sRGB) at --ab-steps (both arms)
    and --steps (default arm), over --eval-views views.
  - fox_view0_r4.png written BEFORE each full-eval record lands, and
    again at end-of-run if missing, so an interrupted run still leaves
    the artifact.

Sections that have not run yet are explicit: full_eval values start as
null with a "not run" note (round-3 hygiene finding: an empty dict
read as "ran and found nothing").

Writes walkthrough_out/fox_quality_r4.json; keeps a resume snapshot
per arm (the tunneled TPU can wedge a process for tens of minutes;
--resume continues from the last milestone).

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
TIMELINE_VIEWS = (0, 30)
MILESTONES = [256, 512, 1024, 2048, 3072, 4096, 6144, 8192, 10240]


def load_json(path):
    if os.path.isfile(path):
        with open(path) as f:
            return json.load(f)
    return None


def save(report, args):
    with open(os.path.join(args.out_dir, "fox_quality_r4.json"), "w") as f:
        json.dump(report, f, indent=1)


def write_view_png(impl, args):
    import numpy as np

    from instant_ngp_tpu.data.images import write_image

    img = impl.render_training_view(0, spp=4, width=540, height=960)
    png = os.path.join(args.out_dir, "fox_view0_r4.png")
    write_image(png, np.clip(img[..., :3], 0, 1).astype(np.float32))
    print("wrote", png, flush=True)


def run_arm(arm: str, steps: int, report: dict, args) -> None:
    import numpy as np

    from instant_ngp_tpu.eval import eval_nerf_views
    from instant_ngp_tpu.testbed import Testbed

    snap = os.path.join(args.out_dir, f"fox_r4_{arm}_resume.ingp")
    tb = Testbed()
    tb.load_training_data(args.scene)
    rec = report["arms"].setdefault(arm, {"timeline": [], "full_eval": {}})
    full_points = [args.ab_steps] + ([steps] if arm == "default" else [])
    for ms in full_points:
        rec["full_eval"].setdefault(
            str(ms), {"status": "not run",
                      "note": "pending; null until the eval completes"})
    t_train = rec["timeline"][-1]["train_time_s"] if rec["timeline"] else 0.0
    trained = rec["timeline"][-1]["step"] if rec["timeline"] else 0

    if args.resume and trained > 0 and os.path.isfile(snap):
        tb.load_snapshot(snap)
        print(f"[{arm}] resumed at step {trained}", flush=True)
    else:
        tb.reload_network_from_file("base.json")
        rec["timeline"] = []
        for ms in full_points:
            rec["full_eval"][str(ms)] = {
                "status": "not run",
                "note": "pending; null until the eval completes"}
        t_train, trained = 0.0, 0
    impl = tb.impl
    impl.rays_per_batch = 1 << 11
    impl.adapt_ray_batch = False
    if arm == "exact":
        impl.stochastic_corners = False
    elif arm == "no_errmap":
        # ablation: error-map importance sampling halves the ray mass
        # onto high-error pixels (reference default too) — it optimizes
        # a weighted objective, not uniform MSE, so it is a decay
        # suspect independent of the estimator
        impl.use_error_map_sampling = False

    tb.train(1)   # compile warm-up outside the timed window
    trained = max(trained, impl.training_step)

    for ms in MILESTONES:
        if ms > steps:
            break
        if ms > trained:
            t0 = time.perf_counter()
            tb.train(ms - trained)
            t_train += time.perf_counter() - t0
            trained = ms
            psnrs = [impl.eval_psnr(v, spp=2, downscale=4)
                     for v in TIMELINE_VIEWS]
            psnrs_full = [impl.eval_psnr(v, spp=2, downscale=1)
                          for v in TIMELINE_VIEWS]
            entry = {"step": ms, "train_time_s": round(t_train, 2),
                     "psnr_ds4_avg": round(float(np.mean(psnrs)), 3),
                     "psnr_full_avg": round(float(np.mean(psnrs_full)), 3),
                     "loss": round(tb.loss, 6)}
            rec["timeline"].append(entry)
            print(f"[{arm}]", entry, flush=True)
            tb.save_snapshot(snap)
            save(report, args)
        fe = rec["full_eval"].get(str(ms))
        if ms in full_points and fe is not None \
                and fe.get("status") == "not run":
            if arm == "default":
                # PNG FIRST: an interruption mid-eval must still leave
                # the rendered-view artifact (ADVICE r3 #3)
                write_view_png(impl, args)
            print(f"[{arm}] full-res spp-8 eval at {ms}...", flush=True)
            t0 = time.perf_counter()
            ev = eval_nerf_views(impl, indices=args.eval_views, spp=8,
                                 downscale=1)
            ev["eval_wall_s"] = round(time.perf_counter() - t0, 1)
            out = {k: (round(v, 4) if isinstance(v, float) else
                       [round(x, 3) for x in v])
                   for k, v in ev.items()}
            out["status"] = "done"
            out["views"] = args.eval_views
            rec["full_eval"][str(ms)] = out
            save(report, args)
            print(f"[{arm}] full eval @{ms}:", out, flush=True)


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
    ap.add_argument("--eval-views", type=int, nargs="*",
                    default=EVAL_VIEWS)
    ap.add_argument("--resume", action="store_true")
    args = ap.parse_args()

    import jax

    os.makedirs(args.out_dir, exist_ok=True)
    path = os.path.join(args.out_dir, "fox_quality_r4.json")
    report = (load_json(path) if args.resume else None) or {
        "scene": "fox (real capture, OpenCV lens, 67 views; no test "
                 "split - train-view eval like reference run.py)",
        "backend": jax.default_backend(),
        "eval_protocol": {"views": args.eval_views, "spp": 8,
                          "downscale": 1, "min_transmittance": 1e-4,
                          "bg": "black",
                          "note": "eval_test_transforms semantics"},
        "timeline_protocol": {
            "views": list(TIMELINE_VIEWS), "spp": 2,
            "note": "psnr_ds4_avg (downscale 4: area-averaged GT vs "
                    "point-sampled render, falls as the model sharpens) "
                    "PAIRED with psnr_full_avg (downscale 1: the honest "
                    "trajectory) at every milestone"},
        "arms": {},
    }
    # a resumed report keeps its history but the protocol header must
    # describe what THIS run evaluates (each full_eval also records its
    # own views list)
    report["eval_protocol"]["views"] = args.eval_views
    for arm in args.arms:
        steps = args.steps if arm == "default" else args.ab_steps
        run_arm(arm, steps, report, args)
    save(report, args)
    # end-of-run backstop for the committed artifact (ADVICE r3 #3)
    if not os.path.isfile(os.path.join(args.out_dir, "fox_view0_r4.png")):
        print("final PNG missing; not rendered (arm list w/o default?)",
              flush=True)
    print("wrote", path, flush=True)


if __name__ == "__main__":
    main()
