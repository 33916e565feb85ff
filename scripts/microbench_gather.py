#!/usr/bin/env python3
"""Measure TPU gather/scatter descriptor economics (the cost unit of
this framework — see docs/tpu_performance_model.md).

Questions this answers, each driving an encode-design decision:
  1. flat f32 gather rate (baseline descriptors/s).
  2. does a complex64 gather cost 1 or 2 descriptors? (XLA decomposes
     complex into real/imag on TPU -> expect 2; explains the r3 c64 A/B
     null result, walkthrough_out/ab_c64_r3.json).
  3. does gathering a 128-lane ROW of a (T/128, 128) table cost ~1
     descriptor? If yes, an interleaved table fetches ALL F features
     per (sample, level, corner) with ONE descriptor instead of F/2.
  4. row gather + dynamic lane-select of F=4 features (the end-to-end
     candidate forward path): mask-multiply-reduce over the 128 lanes.
  5. flat f32 scatter-add rate (baseline).
  6. does scatter-adding (N, 128) rows into a (T/128, 128) table cost
     ~1 descriptor per row? If yes, the backward deposits all F feature
     grads per corner with ONE descriptor instead of F.
  7. end-to-end candidate backward: build one-hot rows from (N, F)
     grads, row-scatter-add.

Usage: python scripts/microbench_gather.py [--n 4194304] [--iters 8]
"""

import argparse
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


def timed(fn, *args, iters=8):
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
    ap.add_argument("--n", type=int, default=1 << 22)
    ap.add_argument("--table", type=int, default=1 << 22)
    ap.add_argument("--iters", type=int, default=8)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    N, T = args.n, args.table
    key = jax.random.PRNGKey(0)
    idx = jax.random.randint(key, (N,), 0, T)
    table = jax.random.normal(jax.random.fold_in(key, 1), (T,))
    vals = jax.random.normal(jax.random.fold_in(key, 2), (N,))

    report = {"backend": jax.default_backend(), "n": N, "table": T,
              "cases_ms": {}}

    def run(name, fn, *a, count=None):
        t = timed(jax.jit(fn), *a, iters=args.iters)
        report["cases_ms"][name] = round(t, 3)
        rate = (count if count is not None else N) / (t * 1e-3) / 1e6
        report["cases_ms"][name + "_Mdesc_per_s_if_1desc"] = round(rate, 1)

    # 1. flat f32 gather
    run("gather_flat_f32", lambda t, i: t[i], table, idx)

    # 2. complex64 flat gather
    table_c = jax.lax.complex(table, table * 0.5)
    run("gather_flat_c64", lambda t, i: jnp.real(t[i]) + jnp.imag(t[i]),
        table_c, idx)

    # 3. row gathers from (T/R, 128): one descriptor per ROW?
    rows128 = table.reshape(T // 128, 128)
    idx_row = idx % (T // 128)
    run("gather_rows128_f32", lambda t, i: t[i].sum(-1), rows128, idx_row)
    # narrower logical rows (physically padded to 128 lanes on TPU)
    rows8 = table.reshape(T // 8, 8)
    idx_row8 = idx % (T // 8)
    run("gather_rows8_f32", lambda t, i: t[i].sum(-1), rows8, idx_row8)

    # 4. row gather + dynamic 4-lane select (candidate encode forward):
    #    entry e -> row e//32, lanes 4*(e%32)+j
    def rowsel(t, e):
        r = t[e // 32]                                   # (N, 128)
        off = (4 * (e % 32))[:, None]                    # (N, 1)
        lanes = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
        outs = [jnp.sum(r * (lanes == off + j), axis=-1) for j in range(4)]
        return outs[0] + outs[1] + outs[2] + outs[3]

    run("gather_row_select4_f32", rowsel, rows128, idx)

    # 4b. bf16 row variant: 256 bf16 lanes per row -> 64 entries/row
    rows_bf = table.astype(jnp.bfloat16).reshape(T // 128, 128)
    run("gather_rows128_bf16", lambda t, i: t[i].astype(jnp.float32).sum(-1),
        rows_bf, idx_row)

    # 5. flat f32 scatter-add
    run("scatter_flat_add_f32",
        lambda v, i: jnp.zeros(T, jnp.float32).at[i].add(v), vals, idx)

    # 5b. complex64 flat scatter-add (the r3 A/B showed ~5x cost)
    vals_c = jax.lax.complex(vals, vals * 0.5)
    run("scatter_flat_add_c64",
        lambda v, i: jnp.real(jnp.zeros(T // 2, jnp.complex64)
                              .at[i % (T // 2)].add(v)).sum(),
        vals_c, idx)

    # 6. row scatter-add of dense (Nr, 128) updates at HALF the gather N
    #    (backward corner count: one Bernoulli corner per sample-level)
    Nr = N // 2
    upd = jax.random.normal(jax.random.fold_in(key, 3), (Nr, 128))
    idx_r = idx[:Nr] % (T // 128)
    run("scatter_rows128_add_f32",
        lambda u, i: jnp.zeros((T // 128, 128), jnp.float32).at[i].add(u),
        upd, idx_r, count=Nr)

    # 7. end-to-end candidate backward: (Nr, 4) grads -> one-hot
    #    (Nr, 128) rows -> row scatter-add (vs 4 flat scatters, case 7b)
    g4 = jax.random.normal(jax.random.fold_in(key, 4), (Nr, 4))
    e_r = idx[:Nr]

    def bwd_rows(g, e):
        off = (4 * (e % 32))[:, None]
        lanes = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
        rows = sum((lanes == off + j).astype(jnp.float32) * g[:, j:j + 1]
                   for j in range(4))
        return jnp.zeros((T // 128, 128), jnp.float32).at[e // 32].add(rows)

    run("scatter_onehot_rows_add_f32", bwd_rows, g4, e_r, count=Nr)

    # 7b. the flat-scatter equivalent at the same Nr (4 descriptors per
    #     element -> direct comparison for the backward redesign)
    def bwd_flat(g, e):
        out = jnp.zeros(T, jnp.float32)
        for j in range(4):
            out = out.at[(4 * e + j) % T].add(g[:, j])
        return out

    run("scatter_flat4_add_f32", bwd_flat, g4, e_r, count=Nr)

    # 8. does a SEGMENT-SORTED row scatter help? (indices ascending ->
    #    RMW locality) — decides whether pre-sorting is worth a sort pass
    idx_sorted = jnp.sort(idx_r)
    run("scatter_rows128_add_f32_sorted",
        lambda u, i: jnp.zeros((T // 128, 128), jnp.float32).at[i].add(u),
        upd, idx_sorted, count=Nr)

    print(json.dumps(report, indent=1))


if __name__ == "__main__":
    main()
