#!/usr/bin/env python3
"""Measure stream-compaction strategies on TPU (the non-encode line of
the descriptor ledger, docs/tpu_performance_model.md).

compact_samples needs src[rank] = candidate_index for the ~S emitting
candidates of an (R, M) grid (R*M ~ 2.1M, S ~ 0.26M at the fox
operating point). Strategies:

  scatter   - the shipped path: one R*M-element scatter with the
              non-emitting 88% writing to a sentinel slot (descriptor
              cost is per SOURCE element, so the dead writes still pay).
  sort      - sort (flat_pos, arange) pairs by key ascending and slice
              the first S: XLA sort is dense comparison passes
              (bandwidth-bound, no descriptors) — does O(N log N) dense
              work beat 2.1M scatter descriptors?
  top_k     - jax.lax.top_k on negated keys (same question, different
              lowering).

Each strategy is validated against the scatter result before timing.

Usage: python scripts/microbench_compact.py [--rays 2048] [--march 1024]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def _sync(out):
    import jax
    import numpy as np

    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(jax.device_get(leaf.ravel()[0:1]))


def timed(fn, *args, iters=8):
    out = fn(*args)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _sync(out)
    return (time.perf_counter() - t0) * 1e3 / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rays", type=int, default=1 << 11)
    ap.add_argument("--march", type=int, default=1024)
    ap.add_argument("--capacity", type=int, default=1 << 18)
    ap.add_argument("--density", type=float, default=0.125,
                    help="fraction of candidates emitting")
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    R, M, cap = args.rays, args.march, args.capacity
    n = R * M
    key = jax.random.PRNGKey(0)
    emit = jax.random.uniform(key, (R, M)) < args.density
    e = emit.astype(jnp.int32)
    base = jnp.cumsum(jnp.sum(e, axis=1)) - jnp.sum(e, axis=1)
    rank = base[:, None] + jnp.cumsum(e, axis=1) - e
    flat_pos = jnp.where(emit, rank, cap)
    flat_pos = jnp.minimum(flat_pos, cap).reshape(-1)

    @jax.jit
    def via_scatter(fp):
        src = jnp.full(cap + 1, n, jnp.int32)
        return src.at[fp].set(jnp.arange(n, dtype=jnp.int32),
                              mode="drop")[:cap]

    @jax.jit
    def via_sort(fp):
        keys, vals = jax.lax.sort(
            (fp, jnp.arange(n, dtype=jnp.int32)), num_keys=1)
        out = jnp.full(cap, n, jnp.int32)
        m = min(cap, n)
        # emitted candidates occupy ranks [0, S); keys are exactly their
        # ranks so the slice IS the compacted array
        return out.at[:m].set(jnp.where(keys[:m] < cap, vals[:m], n))

    @jax.jit
    def via_topk(fp):
        # top_k returns DESCENDING neg keys = ascending flat_pos, with
        # ties broken by ascending index — exactly compaction order
        neg = -(fp.astype(jnp.int32))
        m = min(cap, n)
        _, idx = jax.lax.top_k(neg, m)
        vals = idx.astype(jnp.int32)
        keys = fp[vals]
        out = jnp.full(cap, n, jnp.int32)
        return out.at[:m].set(jnp.where(keys < cap, vals, n))

    ref = np.asarray(via_scatter(flat_pos))
    report = {"backend": jax.devices()[0].platform, "rays": R, "march": M,
              "capacity": cap, "density": args.density, "cases_ms": {}}
    for name, fn in (("scatter", via_scatter), ("sort", via_sort),
                     ("topk", via_topk)):
        try:
            got = np.asarray(fn(flat_pos))
            s = int((ref < n).sum())
            ok = bool((got[:s] == ref[:s]).all())
            ms = timed(fn, flat_pos, iters=args.iters)
            report["cases_ms"][name] = {"ms": round(ms, 3), "match": ok}
        except Exception as ex:  # top_k of 2M may be unsupported/slow
            report["cases_ms"][name] = {"error": str(ex)[:200]}
        print(name, report["cases_ms"][name], flush=True)

    if args.out:
        with open(args.out, "w") as f:
            json.dump(report, f, indent=1)
        print("wrote", args.out)


if __name__ == "__main__":
    main()
