#!/usr/bin/env python3
"""Backward-deposit strategy microbench (VERDICT r3 #3a).

The encode backward's one-hot row scatter-add runs at 57-61 M rows/s
vs the 306 M/s row gather (microbench_gather_r3.json) — ~33 ms of the
~153 ms fox train step. This prices the candidate replacements at the
train operating point (n = S*L ~ 1.9 M deposits into the ~91k-row
interleaved table):

  row_deposit        : current baseline — build (chunk, 128) one-hot
                       rows, acc.at[row].add(rows).
  row_deposit_sorted : same, entries pre-sorted (payload rides the
                       sort) — does descriptor-stream locality help?
  flat4_deposit      : F=4 separate flat scatter-adds (the pre-row
                       design; 4x descriptors at the flat rate).
  oob_drop_X         : row deposit with X% of indices out-of-bounds in
                       drop mode — if dropped descriptors are free,
                       sort+coalesce can shrink the effective bill on
                       the duplicate-heavy coarse levels.
  coalesced_deposit  : sort by entry, segment-sum duplicate runs by
                       cumsum boundary-diff (dense ops), dupes -> OOB,
                       then row deposit. Wins only if oob_drop is
                       cheap AND duplication is heavy.

Duplication regimes measured: `uniform` (hashed-level statistics,
~52% unique at S=2^18 into 2^19 entries) and `coarse` (level-0
statistics: 2^18 deposits into 4096 entries, 1.6% unique).

Usage: python scripts/microbench_deposit.py [--n 2097152] [--iters 8]
Writes walkthrough_out/microbench_deposit_r4.json.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

REPO = os.path.join(os.path.dirname(__file__), "..")
F = 4
EPR = 128 // F  # entries per 128-lane row


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
    ap.add_argument("--entries", type=int, default=1 << 19)
    ap.add_argument("--iters", type=int, default=8)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    n = args.n
    rows = args.entries * F // 128

    key = jax.random.PRNGKey(0)
    gs = [jax.random.normal(jax.random.fold_in(key, 10 + k), (n,))
          for k in range(F)]
    lanes = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)

    def row_deposit(entry, g0, g1, g2, g3, n_rows=rows):
        acc = jnp.zeros((n_rows, 128), jnp.float32)
        off = ((entry % EPR) * F)[:, None]
        gl = [g0, g1, g2, g3]
        rws = None
        for k in range(F):
            r = jnp.where(lanes == off + k, gl[k][:, None], 0.0)
            rws = r if rws is None else rws + r
        return acc.at[entry // EPR].add(rws, mode="drop")

    def flat4_deposit(entry, g0, g1, g2, g3):
        acc = jnp.zeros(args.entries * F, jnp.float32)
        for k, g in enumerate((g0, g1, g2, g3)):
            acc = acc.at[entry * F + k].add(g, mode="drop")
        return acc

    def coalesced_deposit(entry, g0, g1, g2, g3):
        e_s, s0, s1, s2, s3 = jax.lax.sort(
            (entry, g0, g1, g2, g3), num_keys=1)
        segs = [s0, s1, s2, s3]
        # segmented inclusive scan (Hillis-Steele), dense shifts only:
        # keys are SORTED, so e[i] == e[i-shift] implies the whole
        # window shares the key — the masked add never crosses a
        # segment boundary
        shift = 1
        while shift < n:
            same = jnp.concatenate(
                [jnp.zeros(shift, bool), e_s[shift:] == e_s[:-shift]])
            segs = [s + jnp.where(
                same, jnp.concatenate([jnp.zeros(shift, s.dtype),
                                       s[:-shift]]), 0.0)
                for s in segs]
            shift *= 2
        is_end = jnp.concatenate(
            [e_s[:-1] != e_s[1:], jnp.ones(1, bool)])
        # run ends carry the whole run's sum; dupes -> OOB drop
        e_dep = jnp.where(is_end, e_s, jnp.int32(args.entries * 2))
        return row_deposit(e_dep,
                           *[jnp.where(is_end, s, 0.0) for s in segs])

    report = {"backend": jax.default_backend(), "n": n,
              "entries": args.entries, "f": F, "regimes": {}}

    # `mixed` mirrors the real train-step distribution: n deposits
    # split evenly over 8 levels at the fox table's per-level sizes
    # (dense coarse levels duplicate heavily; fine levels hash-spread),
    # each level offset into its own table region like the interleaved
    # layout. This is the regime the 57 M/s production ledger rate
    # comes from — the r4 run priced only single-level extremes at
    # dispatch-bound n=65k (VERDICT r4 weak #4).
    level_sizes = [4096, 12167, 32768, 91125, 262144, 524288, 524288,
                   524288]

    def mixed_entries(key):
        per = n // len(level_sizes)
        parts, off = [], 0
        for li, sz in enumerate(level_sizes):
            parts.append(off + jax.random.randint(
                jax.random.fold_in(key, 50 + li), (per,), 0, sz))
            off += sz
        e = jnp.concatenate(parts)
        return jnp.pad(e, (0, n - e.shape[0]))

    for regime, n_entries in (("uniform", args.entries),
                              ("coarse", 4096), ("mixed", None)):
        if regime == "mixed":
            entry = mixed_entries(key)
            dom = sum(level_sizes)           # accumulator entry domain
        else:
            entry = jax.random.randint(jax.random.fold_in(key, 1), (n,),
                                       0, n_entries)
            dom = args.entries
        dom_rows = dom * F // 128 + 1
        entry_sorted = jnp.sort(entry)
        cases = {}

        def run(name, fn, *a):
            t = timed(jax.jit(fn), *a, iters=args.iters)
            cases[name] = {"ms": round(t, 3),
                           "Mdep_per_s": round(n / t / 1e3, 1)}

        def rd(entry, g0, g1, g2, g3):
            return row_deposit(entry, g0, g1, g2, g3, n_rows=dom_rows)

        def coalesced(entry, g0, g1, g2, g3):
            # same as coalesced_deposit but against this regime's domain
            e_s, s0, s1, s2, s3 = jax.lax.sort(
                (entry, g0, g1, g2, g3), num_keys=1)
            segs = [s0, s1, s2, s3]
            shift = 1
            while shift < n:
                same = jnp.concatenate(
                    [jnp.zeros(shift, bool), e_s[shift:] == e_s[:-shift]])
                segs = [s + jnp.where(
                    same, jnp.concatenate([jnp.zeros(shift, s.dtype),
                                           s[:-shift]]), 0.0)
                    for s in segs]
                shift *= 2
            is_end = jnp.concatenate(
                [e_s[:-1] != e_s[1:], jnp.ones(1, bool)])
            e_dep = jnp.where(is_end, e_s, jnp.int32(dom * 2))
            return rd(e_dep, *[jnp.where(is_end, s, 0.0) for s in segs])

        run("row_deposit", rd, entry, *gs)
        run("row_deposit_sorted", rd, entry_sorted, *gs)
        for frac in (0.5, 0.9):
            cut = int(n * frac)
            e_oob = jnp.where(jnp.arange(n) < cut,
                              jnp.int32(dom * 2), entry)
            run(f"oob_drop_{int(frac*100)}", rd, e_oob, *gs)
        run("coalesced_deposit", coalesced, entry, *gs)
        # correctness: coalesced == plain on the first feature
        import numpy as np

        a = np.asarray(jax.jit(rd)(entry, *gs))
        b = np.asarray(jax.jit(coalesced)(entry, *gs))
        cases["coalesced_max_err"] = float(np.abs(a - b).max())
        report["regimes"][regime] = cases
        print(regime, json.dumps(cases, indent=1), flush=True)

    out = os.path.join(REPO, "walkthrough_out",
                       "microbench_deposit_r5.json")
    with open(out, "w") as f:
        json.dump(report, f, indent=1)
    print("wrote", out)


if __name__ == "__main__":
    main()
