"""Benchmark driver: prints ONE JSON line with the headline metric.

Current headline: image-mode training throughput (samples/s/chip) on the
reference batch size 2^18. Will switch to NeRF time-to-PSNR on fox once
the NeRF testbed lands. `vs_baseline` compares against the reference's
implied operating point: an RTX 3090 running ~10 image-mode steps of 2^18
samples per second (README "few seconds" convergence ≈ 2.6 M samples/s).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from instant_ngp_tpu.image import ImageTestbed

    # synthetic 1024x1024 target (matches albert.exr dims; no data dep)
    y, x = np.mgrid[0:1024, 0:1024].astype(np.float32) / 1024.0
    img = np.stack([0.5 + 0.5 * np.sin(20 * x),
                    0.5 + 0.5 * np.cos(14 * y),
                    (x * y)], axis=-1)

    cfg = {
        "loss": {"otype": "L2"},
        "optimizer": {"otype": "ExponentialDecay", "decay_start": 20000,
                      "decay_interval": 10000, "decay_base": 0.33, "nested": {
                          "otype": "Adam", "learning_rate": 1e-2,
                          "beta1": 0.9, "beta2": 0.99, "epsilon": 1e-15,
                          "l2_reg": 1e-6}},
        "encoding": {"otype": "HashGrid", "n_levels": 16,
                     "n_features_per_level": 2, "log2_hashmap_size": 19,
                     "base_resolution": 16},
        "network": {"otype": "FullyFusedMLP", "activation": "ReLU",
                    "output_activation": "None", "n_neurons": 64,
                    "n_hidden_layers": 2},
    }

    batch = 1 << 18
    tb = ImageTestbed(img, cfg)
    tb.train(3, batch_size=batch)  # warmup + compile

    n_steps = 30
    t0 = time.perf_counter()
    tb.train(n_steps, batch_size=batch)
    dt = time.perf_counter() - t0

    samples_per_s = n_steps * batch / dt
    baseline = 2.6e6  # RTX 3090 implied image-mode samples/s (see docstring)
    print(json.dumps({
        "metric": "image_train_samples_per_s",
        "value": round(samples_per_s, 1),
        "unit": "samples/s/chip",
        "vs_baseline": round(samples_per_s / baseline, 3),
    }))


if __name__ == "__main__":
    main()
