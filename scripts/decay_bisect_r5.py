#!/usr/bin/env python3
"""PSNR-decay bisect (VERDICT r4 #1).

Round-4 established: fox full-res PSNR peaks ~step 512 then decays
monotonically while training loss falls, in ALL of default /
exact-encode / no-errmap arms. This harness isolates the remaining
suspects one variable at a time, from a SHARED step-512 snapshot so
every arm sees the identical model/optimizer/grid state and the
identical training RNG stream afterwards:

  control      default settings (reproduces the decay — the yardstick)
  freeze_grid  occupancy grid/bitfield frozen at step 512 (no density
               updates after the snapshot). If decay stops, the grid's
               evolution (overculling as density sharpens) is the cause.
  no_reg       output-L2 / density-L1 / near-plane regularizers removed
               from the loss.

Every milestone evaluates BOTH ema and raw params (2 views, ds4 spp-2 —
the r4 data shows ds4 tracks full-res with a constant offset), which
bisects the EMA-at-eval hypothesis inside every arm for free.

Writes walkthrough_out/decay_bisect_r5.json after every milestone.
Reference behavior being chased: converge-and-hold to 35k steps
(/root/reference/scripts/run.py:179; README.md:5).
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

REPO = os.path.join(os.path.dirname(__file__), "..")
VIEWS = (0, 30)
MILESTONES = [1024, 2048, 3072, 4096]
BASE_STEP = 512


def save(report, path):
    with open(path, "w") as f:
        json.dump(report, f, indent=1)


def fresh_testbed(scene):
    from instant_ngp_tpu.testbed import Testbed

    tb = Testbed()
    tb.load_training_data(scene)
    tb.reload_network_from_file("base.json")
    impl = tb.impl
    impl.rays_per_batch = 1 << 11
    impl.adapt_ray_batch = False
    return tb


def eval_both(impl):
    """(psnr_ema, psnr_raw) averaged over VIEWS at ds4 spp2."""
    import numpy as np

    ema = [impl.eval_psnr(v, spp=2, downscale=4) for v in VIEWS]
    orig = impl.inference_params
    impl.inference_params = lambda: impl.state["params"]
    try:
        raw = [impl.eval_psnr(v, spp=2, downscale=4) for v in VIEWS]
    finally:
        impl.inference_params = orig
    return float(np.mean(ema)), float(np.mean(raw))


def run_arm(arm, scene, snap, report, path):
    if arm == "f32":
        # full-f32 compute (the shipped default is bf16 MLP compute with
        # f32 masters): if decay stops, long-run bf16 rounding is the
        # degradation channel
        import jax.numpy as jnp

        from instant_ngp_tpu.config import (find_network_config,
                                            load_network_config)
        from instant_ngp_tpu.data.nerf_loader import load_nerf
        from instant_ngp_tpu.data.snapshot import load_snapshot
        from instant_ngp_tpu.nerf.testbed_nerf import NerfTestbed

        ds = load_nerf([scene])
        cfg = load_network_config(find_network_config("base.json",
                                                      mode="nerf"))
        impl = NerfTestbed(ds, cfg, compute_dtype=jnp.float32)
        impl.load_snapshot_state(load_snapshot(snap))
    else:
        tb = fresh_testbed(scene)
        tb.load_snapshot(snap)
        impl = tb.impl
    impl.rays_per_batch = 1 << 11
    impl.adapt_ray_batch = False
    if arm == "freeze_grid":
        impl.prep_every = 1 << 30   # no density update ever fires again
    elif arm == "no_reg":
        impl.disable_regularizers = True
    elif arm == "prep1":
        # reference cadence: density update EVERY step (training_prep
        # runs per step in the reference; the repo amortizes to one
        # mixed prep per 16 — a 16x slower carve)
        impl.prep_every = 1
    elif arm == "extrinsics":
        # camera refinement (the reference's own documented
        # recommendation for real handheld captures): if the decay is
        # edge error from sub-pixel camera misalignment that sharpening
        # exposes, per-image pose refinement should recover it
        impl.optimize_extrinsics = True
    elif arm == "loss_l2":
        # Huber saturates large per-pixel errors while PSNR is
        # MSE-dominated by them; L2 keeps full gradient pressure on
        # outlier pixels (floaters). The reference default is Huber
        # too, so this arm tests an interaction, not a divergence.
        from instant_ngp_tpu.ops.losses import LossType

        impl.loss_type = LossType.L2

    rec = report["arms"].setdefault(arm, {"timeline": []})
    trained = BASE_STEP
    t_train = 0.0
    impl.train(1)  # compile warmup outside timing
    trained = impl.training_step
    for ms in MILESTONES:
        t0 = time.perf_counter()
        impl.train(ms - trained)
        t_train += time.perf_counter() - t0
        trained = ms
        p_ema, p_raw = eval_both(impl)
        entry = {"step": ms, "psnr_ema": round(p_ema, 3),
                 "psnr_raw": round(p_raw, 3),
                 "loss": round(float(impl.loss_scalar), 6),
                 "mean_density": round(float(impl.mean_density), 5),
                 "occupied_frac": occupied_frac(impl),
                 "train_time_s": round(t_train, 1)}
        rec["timeline"].append(entry)
        print(f"[{arm}]", entry, flush=True)
        save(report, path)


def occupied_frac(impl):
    """Fraction of cascade-0 bitfield bits set (grid-culling telemetry)."""
    import numpy as np

    from instant_ngp_tpu.common import NERF_GRID_N_CELLS

    bits = np.asarray(impl.bitfield[:NERF_GRID_N_CELLS // 8])
    return round(float(np.unpackbits(bits).mean()), 5)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene",
                    default="/root/reference/data/nerf/fox/transforms.json")
    ap.add_argument("--arms", nargs="*",
                    default=["control", "freeze_grid", "no_reg"])
    ap.add_argument("--out", default=os.path.join(
        REPO, "walkthrough_out", "decay_bisect_r5.json"))
    args = ap.parse_args()

    import jax

    snap = os.path.join(REPO, "walkthrough_out", "decay_base_512.ingp")
    path = args.out
    report = {"scene": "fox", "backend": jax.default_backend(),
              "base_step": BASE_STEP,
              "protocol": {"views": list(VIEWS), "spp": 2, "downscale": 4,
                           "note": "psnr_ema + psnr_raw per milestone; "
                                   "ds4 tracks full-res with constant "
                                   "offset (fox_quality_r4 timeline)"},
              "arms": {}}
    if os.path.isfile(path):
        with open(path) as f:
            old = json.load(f)
        if old.get("base_step") == BASE_STEP:
            report = old

    if not os.path.isfile(snap):
        print("training shared base to step", BASE_STEP, flush=True)
        tb = fresh_testbed(args.scene)
        tb.train(BASE_STEP)
        p_ema, p_raw = eval_both(tb.impl)
        report["base_eval"] = {"step": BASE_STEP,
                               "psnr_ema": round(p_ema, 3),
                               "psnr_raw": round(p_raw, 3),
                               "occupied_frac": occupied_frac(tb.impl)}
        tb.save_snapshot(snap)
        save(report, path)
        print("base:", report["base_eval"], flush=True)

    for arm in args.arms:
        if arm in report["arms"] and report["arms"][arm]["timeline"] \
                and report["arms"][arm]["timeline"][-1]["step"] >= \
                MILESTONES[-1]:
            print(f"[{arm}] already complete; skipping", flush=True)
            continue
        report["arms"].pop(arm, None)  # restart incomplete arm cleanly
        run_arm(arm, args.scene, snap, report, path)
    save(report, path)
    print("wrote", path, flush=True)


if __name__ == "__main__":
    main()
