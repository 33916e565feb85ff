#!/usr/bin/env python3
"""A/B the grid-encoding fetch/deposit strategies on real hardware.

Variants (ops/grid_encoding.py):
  planar_unpacked - planar layout, one f32 gather descriptor per
                    (sample, level, corner, feature).
  planar_packed   - planar layout, bf16-pair words: one descriptor per
                    feature PAIR (the round-2 default).
  row             - ENTRY-INTERLEAVED layout (the round-3 default): one
                    128-lane row descriptor per (sample, level, corner)
                    fetches ALL F features; backward deposits them as
                    one one-hot row scatter-add.

Each variant is timed in exact mode (8 corners) and the production
stochastic mode (stochastic_exact_axes=1 + stochastic_bwd), forward and
forward+backward, plus parity deltas vs planar_unpacked.

History: the round-2 candidate (complex64 packings) was refuted on TPU
(walkthrough_out/ab_c64_r3.json — c64 gather costs 2 f32 descriptors,
c64 scatter-add ~11x slower; XLA decomposes complex on TPU) and removed;
the row design came from walkthrough_out/microbench_gather_r3.json.

Usage: python scripts/ab_encode_variants.py [--n 262144] [--iters 12]
"""

import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def _sync(out):
    # one-element D2H readback: the only trustworthy fence on the
    # tunneled 'axon' platform (block_until_ready returns early);
    # slice on device so one element crosses the tunnel.
    import jax
    import numpy as np

    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(jax.device_get(leaf.ravel()[0:1]))


def timed(fn, *args, iters=12):
    """Pipelined: enqueue `iters` dispatches, fence once; total/iters."""
    out = fn(*args)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _sync(out)
    return (time.perf_counter() - t0) * 1e3 / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1 << 18)
    ap.add_argument("--iters", type=int, default=12)
    ap.add_argument("--levels", type=int, default=8)
    ap.add_argument("--feats", type=int, default=4)
    ap.add_argument("--scale", type=float, default=1.62,
                    help="per-level scale (the NeRF model derives ~2.0 "
                         "for finest=2048 at L=8)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from instant_ngp_tpu.ops.grid_encoding import GridEncoding

    variants = {
        "planar_unpacked": dict(row_gather=False, packed=False),
        "planar_packed": dict(row_gather=False, packed=True),
        "row": dict(row_gather=True),
    }

    base = GridEncoding(n_dims=3, n_levels=args.levels,
                        n_features_per_level=args.feats,
                        log2_hashmap_size=19, base_resolution=16,
                        per_level_scale=args.scale,
                        stochastic_exact_axes=1, stochastic_bwd=True,
                        row_gather=False, packed=False)
    params_planar = base.init(jax.random.PRNGKey(0))
    key = jax.random.PRNGKey(1)
    comps = [jax.random.uniform(jax.random.fold_in(key, c), (args.n,))
             for c in range(3)]
    rng = jax.random.PRNGKey(2)

    report = {"backend": jax.default_backend(), "n": args.n,
              "levels": args.levels, "feats": args.feats,
              "scale": args.scale, "variants": {}}

    outs, grads = {}, {}
    for name, kw in variants.items():
        enc = dataclasses.replace(base, **kw)
        params = enc.convert_layout(params_planar, "planar")

        @jax.jit
        def fwd_exact(p, cx, cy, cz, _enc=enc):
            return _enc.apply_components(p, [cx, cy, cz])

        @jax.jit
        def bwd_exact(p, cx, cy, cz, _enc=enc):
            def f(pp):
                o = _enc.apply_components(pp, [cx, cy, cz])
                return jnp.sum(o * o)
            return jax.grad(f)(p)

        @jax.jit
        def fwd_stoch(p, cx, cy, cz, r, _enc=enc):
            return _enc.apply_components(p, [cx, cy, cz], rng=r)

        @jax.jit
        def bwd_stoch(p, cx, cy, cz, r, _enc=enc):
            def f(pp):
                o = _enc.apply_components(pp, [cx, cy, cz], rng=r)
                return jnp.sum(o * o)
            return jax.grad(f)(p)

        rep = {
            "exact_fwd_ms": round(timed(fwd_exact, params, *comps,
                                        iters=args.iters), 3),
            "exact_fwd_bwd_ms": round(timed(bwd_exact, params, *comps,
                                            iters=args.iters), 3),
            "stoch_fwd_ms": round(timed(fwd_stoch, params, *comps, rng,
                                        iters=args.iters), 3),
            "stoch_fwd_bwd_ms": round(timed(bwd_stoch, params, *comps, rng,
                                            iters=args.iters), 3),
        }
        outs[name] = fwd_stoch(params, *comps, rng)
        # compare gradients in PLANAR layout
        g = bwd_stoch(params, *comps, rng)
        grads[name] = g if not enc._row_mode else jnp.concatenate(
            [g.reshape(-1, args.feats)[:, k] for k in range(args.feats)])
        report["variants"][name] = rep

    ref_o, ref_g = outs["planar_unpacked"], grads["planar_unpacked"]
    for name in variants:
        do = float(jnp.max(jnp.abs(outs[name] - ref_o)))
        dg = float(jnp.max(jnp.abs(grads[name] - ref_g)))
        report["variants"][name]["max_abs_out_delta"] = do
        report["variants"][name]["max_abs_grad_delta"] = dg
        assert np.isfinite(do) and np.isfinite(dg)
    print(json.dumps(report, indent=1))


if __name__ == "__main__":
    main()
