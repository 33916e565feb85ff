#!/usr/bin/env python3
"""Price row-gather lane-SELECT and one-hot row DEPOSIT variants on TPU.

The round-3 ledger (docs/tpu_performance_model.md) says the raw row
gather runs ~306M rows/s but the end-to-end forward (gather + select of
F=4 features from the 128-lane row) only ~173M/s, and the backward
one-hot deposit ~57M/s. This bench asks whether a different select /
one-hot construction closes those gaps:

  select_4pass    - shipped: F passes of (lanes == off+k) where+sum.
  select_rank3    - reshape row (c,epr,F), one-hot over epr, single
                    multiply+reduce pass.
  select_dot      - batched matvec: (c,epr,F) x one-hot(c,epr) via
                    einsum (MXU/VPU lowering decided by XLA).
  deposit_4pass   - shipped: F passes of where to build one-hot rows,
                    then .at[].add.
  deposit_rank3   - build (c,epr,F) one-hot update, reshape to
                    (c,128), .at[].add.

Usage: python scripts/microbench_select.py [--n 2097152] [--iters 8]
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
    ap.add_argument("--n", type=int, default=1 << 21)
    ap.add_argument("--table", type=int, default=1 << 24,
                    help="table params (fox NeRF table ~17M)")
    ap.add_argument("--feats", type=int, default=4)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    N, T, F = args.n, args.table, args.feats
    epr = 128 // F
    n_rows = T // 128
    key = jax.random.PRNGKey(0)
    entry = jax.random.randint(key, (N,), 0, T // F)   # entry index
    table = jax.random.normal(jax.random.fold_in(key, 1), (n_rows, 128))
    g4 = jax.random.normal(jax.random.fold_in(key, 2), (N, F))

    report = {"backend": jax.default_backend(), "n": N, "table": T,
              "feats": F, "cases_ms": {}}

    def run(name, fn, *a):
        t = timed(jax.jit(fn), *a, iters=args.iters)
        report["cases_ms"][name] = round(t, 3)
        report["cases_ms"][name + "_Mdesc_per_s"] = round(
            N / (t * 1e-3) / 1e6, 1)
        print(name, report["cases_ms"][name],
              report["cases_ms"][name + "_Mdesc_per_s"], "M/s", flush=True)

    # ---- forward select variants (each returns sum of the F feats so
    # every variant does the same useful work) ----
    def select_4pass(t, e):
        rows = t[e // epr]                               # (N, 128)
        off = ((e % epr) * F)[:, None]
        lanes = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
        feats = [jnp.sum(jnp.where(lanes == off + k, rows, 0.0), axis=-1)
                 for k in range(F)]
        return sum(feats)

    def select_rank3(t, e):
        rows = t[e // epr].reshape(-1, epr, F)           # (N, epr, F)
        hot = jax.lax.broadcasted_iota(jnp.int32, (1, epr), 1) \
            == (e % epr)[:, None]                        # (N, epr)
        picked = jnp.sum(jnp.where(hot[..., None], rows, 0.0), axis=1)
        return jnp.sum(picked, axis=-1)                  # (N,)

    def select_dot(t, e):
        rows = t[e // epr].reshape(-1, epr, F)
        hot = (jax.lax.broadcasted_iota(jnp.int32, (1, epr), 1)
               == (e % epr)[:, None]).astype(jnp.float32)
        picked = jnp.einsum("nef,ne->nf", rows, hot)
        return jnp.sum(picked, axis=-1)

    run("select_4pass", select_4pass, table, entry)
    run("select_rank3", select_rank3, table, entry)
    run("select_dot", select_dot, table, entry)

    # ---- backward deposit variants ----
    def deposit_4pass(g, e):
        off = ((e % epr) * F)[:, None]
        lanes = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
        rows = None
        for k in range(F):
            r = jnp.where(lanes == off + k, g[:, k][:, None], 0.0)
            rows = r if rows is None else rows + r
        return jnp.zeros((n_rows, 128), jnp.float32).at[e // epr].add(rows)

    def deposit_rank3(g, e):
        hot = (jax.lax.broadcasted_iota(jnp.int32, (1, epr), 1)
               == (e % epr)[:, None]).astype(jnp.float32)  # (N, epr)
        upd = (hot[..., None] * g[:, None, :]).reshape(-1, 128)
        return jnp.zeros((n_rows, 128), jnp.float32).at[e // epr].add(upd)

    run("deposit_4pass", deposit_4pass, g4, entry)
    run("deposit_rank3", deposit_rank3, g4, entry)

    # parity checks (tiny slice on host)
    import numpy as np
    a = np.asarray(jax.jit(select_4pass)(table, entry)[:1024])
    for name, fn in (("select_rank3", select_rank3),
                     ("select_dot", select_dot)):
        b = np.asarray(jax.jit(fn)(table, entry)[:1024])
        report["cases_ms"][name + "_match"] = bool(
            np.allclose(a, b, atol=1e-5))
    da = np.asarray(jax.jit(deposit_4pass)(g4, entry)[:64])
    db = np.asarray(jax.jit(deposit_rank3)(g4, entry)[:64])
    report["cases_ms"]["deposit_rank3_match"] = bool(
        np.allclose(da, db, atol=1e-4))

    print(json.dumps(report, indent=1))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(report, f, indent=1)
        print("wrote", args.out)


if __name__ == "__main__":
    main()
