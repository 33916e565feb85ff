#!/usr/bin/env python3
"""Render-side decay probes on the step-10240 fox snapshot (r5).

Two questions, both answered from the ALREADY-TRAINED round-4 default
arm snapshot (walkthrough_out/fox_r4_default_resume.ingp, step 10240),
so no training cost:

1. TRUNCATION: the eval renderer caps per-ray candidates at 512
   (render_max_samples_per_ray). Fox occupancy GROWS with training
   (decay_bisect_r5: occupied_frac 0.52 @512 -> 0.56+ @1024), so a
   binding cap sheds far content more as training proceeds — a decay
   mechanism that lives entirely in the eval renderer. Probe: eval the
   same views at cap 512 vs 1024 (= n_march, non-binding). A material
   PSNR gain at 1024 confirms truncation as (part of) the decay.

2. STOCHASTIC RENDER ESTIMATOR: eval the same views with
   render_stochastic_corners at spp {2, 8} vs the exact path. The
   PSNR delta prices the ~4x eval-descriptor saving (VERDICT r4 #6);
   wall times recorded per arm.

Writes walkthrough_out/render_probe_r5.json.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

REPO = os.path.join(os.path.dirname(__file__), "..")
OUT = os.path.join(REPO, "walkthrough_out")
VIEWS = (0, 30)


def main():
    import numpy as np

    from instant_ngp_tpu.testbed import Testbed

    snap = os.path.join(OUT, "fox_r4_default_resume.ingp")
    tb = Testbed()
    tb.load_training_data("/root/reference/data/nerf/fox/transforms.json")
    tb.load_snapshot(snap)
    impl = tb.impl
    print("loaded snapshot at step", impl.training_step, flush=True)

    report = {"snapshot_step": int(impl.training_step), "views": list(VIEWS),
              "protocol": "ds4 spp2 unless stated", "arms": {}}
    path = os.path.join(OUT, "render_probe_r5.json")

    def run(name, spp=2, downscale=4):
        t0 = time.perf_counter()
        ps = [impl.eval_psnr(v, spp=spp, downscale=downscale)
              for v in VIEWS]
        report["arms"][name] = {
            "psnr_avg": round(float(np.mean(ps)), 3),
            "psnr_per_view": [round(float(p), 3) for p in ps],
            "wall_s": round(time.perf_counter() - t0, 1)}
        print(name, report["arms"][name], flush=True)
        with open(path, "w") as f:
            json.dump(report, f, indent=1)

    run("cap512_exact")                       # the r4 protocol baseline

    impl.render_max_samples_per_ray = 1024    # non-binding (= n_march)
    run("cap1024_exact")

    impl.render_stochastic_corners = True
    run("cap1024_stoch_spp2")
    run("cap1024_stoch_spp8", spp=8)

    impl.render_max_samples_per_ray = None
    run("cap512_stoch_spp8", spp=8)
    print("wrote", path, flush=True)


if __name__ == "__main__":
    main()
