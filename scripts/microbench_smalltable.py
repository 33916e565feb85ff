#!/usr/bin/env python3
"""Does gather/scatter rate depend on TABLE SIZE? (VERDICT r3 #3 probe)

The descriptor model (docs/tpu_performance_model.md) prices every
random access at a flat ~105-306 M/s regardless of payload. If small
tables (the dense low-res grid levels: level 0 = 16 KB, level 1 =
131 KB of the fox NeRF table) gather faster — cache/VMEM residency —
the encode could split per level and shave 2-3 of the 8 levels'
descriptor bills in each direction.

Usage: python scripts/microbench_smalltable.py [--n 2097152]
Writes walkthrough_out/microbench_smalltable_r4.json.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

REPO = os.path.join(os.path.dirname(__file__), "..")


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
    ap.add_argument("--n", type=int, default=1 << 21)
    ap.add_argument("--iters", type=int, default=8)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    n = args.n
    key = jax.random.PRNGKey(0)
    vals = jax.random.normal(jax.random.fold_in(key, 1), (n,))
    report = {"backend": jax.default_backend(), "n": n, "cases": {}}

    # rows sweep: 128-lane row gather + flat gather + flat scatter-add,
    # tables from 16 KB (level-0 dense) to 64 MB (hashed levels)
    for rows in (1 << 5, 1 << 8, 1 << 11, 1 << 14, 1 << 17):
        table = jax.random.normal(jax.random.fold_in(key, rows),
                                  (rows, 128))
        flat = table.reshape(-1)
        idx_r = jax.random.randint(jax.random.fold_in(key, 2), (n,), 0,
                                   rows)
        idx_f = jax.random.randint(jax.random.fold_in(key, 3), (n,), 0,
                                   rows * 128)
        kb = rows * 128 * 4 // 1024
        c = {}
        t = timed(jax.jit(lambda t_, i: t_[i].sum(-1)), table, idx_r,
                  iters=args.iters)
        c["row_gather_ms"] = round(t, 3)
        c["row_gather_Mps"] = round(n / t / 1e3, 1)
        t = timed(jax.jit(lambda t_, i: t_[i]), flat, idx_f,
                  iters=args.iters)
        c["flat_gather_ms"] = round(t, 3)
        c["flat_gather_Mps"] = round(n / t / 1e3, 1)
        t = timed(jax.jit(
            lambda v, i: jnp.zeros(rows * 128, jnp.float32).at[i].add(v)),
            vals, idx_f, iters=args.iters)
        c["flat_scatter_ms"] = round(t, 3)
        c["flat_scatter_Mps"] = round(n / t / 1e3, 1)
        report["cases"][f"{kb}KB"] = c
        print(kb, "KB", json.dumps(c), flush=True)

    out = os.path.join(REPO, "walkthrough_out",
                       "microbench_smalltable_r4.json")
    with open(out, "w") as f:
        json.dump(report, f, indent=1)
    print("wrote", out)


if __name__ == "__main__":
    main()
