"""Hash-grid encoding Pallas kernel, v2: tile-padding-safe layouts.

v1 (grid_kernels.py) staged each level's table as an (S, F) VMEM block —
correct in interpret mode, but on hardware an (S, 2) block tile-pads its
2-lane minor dimension to 128, inflating a 4 MB table to 256 MB of VMEM.
v2 keeps every buffer in native (8, 128)-tile shapes:

- table: (L, S*F // 128, 128) — entry i's feature k lives at flat
  position i*F+k, i.e. row (i*F+k)//128, lane (i*F+k)%128. Zero padding.
- points: (8, N) component-planes (3 used rows of an 8-sublane block).
- output: (L*F, N) feature-planes; the caller transposes once.

In-kernel lookup = sublane row-take + one-hot lane select: gather the
128-lane row holding the entry (dynamic_gather over sublanes — the one
gather shape Mosaic lowers efficiently), then reduce against an
iota==lane mask on the VPU. 8 corners x F features per level, table
block resident across the point-tile sweep (level-outer grid).
Reference semantics: grid_encoding.py fused path; tcnn grid.h.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_PRIMES = (1, 2654435761, 805459861)
VMEM_TABLE_BUDGET = 8 * 1024 * 1024


def supports(enc) -> bool:
    f = enc.n_features_per_level
    s_max = int(enc._sizes.max())
    return (s_max * f * 4 <= VMEM_TABLE_BUDGET and enc.n_dims == 3
            and (s_max * f) % 128 == 0 and 128 % f == 0)


def pack_table(enc, params: jax.Array) -> jax.Array:
    """flat (total,) -> (L, S_max*F//128, 128), feature-interleaved."""
    f = enc.n_features_per_level
    s_max = int(enc._sizes.max())
    rows = s_max * f // 128
    out = jnp.zeros((enc.n_levels, rows * 128), jnp.float32)
    for lvl in range(enc.n_levels):
        o = int(enc._offsets[lvl]) * f
        s = int(enc._sizes[lvl]) * f
        out = out.at[lvl, :s].set(
            jax.lax.dynamic_slice_in_dim(params, o, s))
    return out.reshape(enc.n_levels, rows, 128)


def grid_encode_pallas_v2(enc, table: jax.Array, comps,
                          tile: int = 2048, interpret: bool = False
                          ) -> jax.Array:
    """table from pack_table; comps = 3 (N,) arrays. Returns (N, L*F)."""
    n = comps[0].shape[0]
    d = enc.n_dims
    f = enc.n_features_per_level
    L = enc.n_levels
    rows = table.shape[1]

    n_pad = (n + tile - 1) // tile * tile
    x_p = jnp.zeros((8, n_pad), jnp.float32)
    for k in range(d):
        x_p = x_p.at[k, :n].set(comps[k].astype(jnp.float32))

    scales = jnp.asarray(enc._scales, jnp.float32)
    res = jnp.asarray(enc._resolutions, jnp.int32)
    sizes = jnp.asarray(enc._sizes, jnp.int32)
    hashed = jnp.asarray(enc._hashed.astype(np.int32))
    strides = jnp.asarray(enc._strides.astype(np.int32))
    corner_list = [tuple(c) for c in enc._corners]
    tiled_wrap = enc.grid_type == "Tiled"
    smoothstep = enc.interpolation == "Smoothstep"
    nearest = enc.interpolation == "Nearest"

    def kernel(scale_ref, res_ref, size_ref, hashed_ref, stride_ref,
               x_ref, table_ref, out_ref):
        lvl = pl.program_id(0)
        scale = scale_ref[lvl]
        r = res_ref[lvl]
        size = size_ref[lvl]
        is_hashed = hashed_ref[lvl]

        comps_t = [x_ref[k, :] for k in range(d)]          # (T,)
        pos = [c * scale + 0.5 for c in comps_t]
        pos0 = [jnp.floor(p) for p in pos]
        w = [p - p0 for p, p0 in zip(pos, pos0)]
        if smoothstep:
            w = [wi * wi * (3.0 - 2.0 * wi) for wi in w]
        elif nearest:
            w = [jnp.round(wi) for wi in w]
        pos0 = [p0.astype(jnp.int32) for p0 in pos0]

        usize = size.astype(jnp.uint32)
        tbl = table_ref[0]                                 # (rows, 128)
        lane_iota = jax.lax.broadcasted_iota(jnp.int32, (tile, 128), 1)

        accs = [jnp.zeros((tile,), jnp.float32) for _ in range(f)]
        for corner in corner_list:
            offs = [int(c) for c in corner]
            coord = [pos0[k] + offs[k] for k in range(d)]
            if tiled_wrap:
                dense_dims = [jnp.remainder(cd, r) for cd in coord]
            else:
                dense_dims = [jnp.clip(cd, 0, r - 1) for cd in coord]
            dense_idx = dense_dims[0].astype(jnp.uint32) \
                * stride_ref[lvl, 0].astype(jnp.uint32)
            for k in range(1, d):
                dense_idx = dense_idx + dense_dims[k].astype(jnp.uint32) \
                    * stride_ref[lvl, k].astype(jnp.uint32)
            hash_idx = coord[0].astype(jnp.uint32) * np.uint32(_PRIMES[0])
            for k in range(1, d):
                hash_idx = hash_idx ^ (coord[k].astype(jnp.uint32)
                                       * np.uint32(_PRIMES[k]))
            entry = jnp.where(is_hashed == 1, hash_idx % usize,
                              dense_idx % usize).astype(jnp.int32)
            flat0 = entry * f                              # feature 0 pos
            row = flat0 >> 7                               # //128
            lane0 = flat0 & 127
            row_vals = jnp.take(tbl, row, axis=0)          # (T, 128)
            weight = jnp.ones((tile,), jnp.float32)
            for k in range(d):
                weight = weight * (w[k] if offs[k] == 1 else 1 - w[k])
            for k in range(f):
                mask = (lane_iota == (lane0 + k)[:, None])
                val = jnp.sum(jnp.where(mask, row_vals, 0.0), axis=1)
                accs[k] = accs[k] + val * weight
        for k in range(f):
            out_ref[k, :] = accs[k]

    grid = (L, n_pad // tile)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=grid,
        in_specs=[
            pl.BlockSpec((8, tile), lambda l, t, *_: (0, t)),
            pl.BlockSpec((1, rows, 128), lambda l, t, *_: (l, 0, 0)),
        ],
        out_specs=pl.BlockSpec((f, tile), lambda l, t, *_: (l, t)),
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((L * f, n_pad), jnp.float32),
        interpret=interpret,
    )(scales, res, sizes, hashed, strides, x_p, table)

    # (L*F, N) -> (N, L*F)
    return out[:, :n].T.astype(enc.dtype)
