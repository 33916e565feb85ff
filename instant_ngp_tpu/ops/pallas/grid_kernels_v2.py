"""Hash-grid encoding Pallas kernel, v2: tile-padding-safe layouts.

WHY: profiled on TPU v5e, the XLA fused-gather encoding costs ~2.3 s per
1M samples forward — random single-element gathers from the ~50 MB
multi-level table go straight to HBM (TPUs have no data cache), so the
chip runs at CPU speed on the framework's dominant op. Staging ONE
level-group's tables in VMEM and sweeping all point tiles against it
turns those HBM random reads into VMEM-local row-takes.

Layouts (all native (8,128)-tile shapes, zero padding waste):
- table: (L/G, G, S*F//128, 128) — G = 8//F levels per grid step; entry
  i of a level holds feature k at flat position i*F+k -> row
  (i*F+k)//128, lane (i*F+k)%128.
- points: (8, N) component-planes (3 used sublanes).
- output: (L*F, N) feature-planes, one (G*F=8, tile) block per
  (level-group, tile); the caller transposes once at the end.

In-kernel lookup = sublane row-take (jnp.take axis=0 — the gather shape
Mosaic lowers natively) + one-hot lane select on the VPU. Grid iterates
(level-group OUTER, point tile inner) so each group's table block stays
resident across the whole point sweep (Pallas skips re-DMA when the
block index is unchanged): total table traffic = one sweep per call.

Reference semantics: ops/grid_encoding.py fused path (tcnn grid.h).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_PRIMES = (1, 2654435761, 805459861)
VMEM_TABLE_BUDGET = 32 * 1024 * 1024  # bytes for one level-GROUP


def _group(enc) -> int:
    return max(8 // enc.n_features_per_level, 1)


def supports(enc) -> bool:
    f = enc.n_features_per_level
    s_max = int(enc._sizes.max())
    g = _group(enc)
    return (g * s_max * f * 4 <= VMEM_TABLE_BUDGET and enc.n_dims == 3
            and (s_max * f) % 128 == 0 and 128 % f == 0
            and enc.n_levels % g == 0 and (g * f) % 8 == 0)


def pack_table(enc, params: jax.Array) -> jax.Array:
    """flat (total,) -> (L/G, G, S_max*F//128, 128), feature-interleaved."""
    f = enc.n_features_per_level
    s_max = int(enc._sizes.max())
    g = _group(enc)
    rows = s_max * f // 128
    out = jnp.zeros((enc.n_levels, rows * 128), jnp.float32)
    for lvl in range(enc.n_levels):
        o = int(enc._offsets[lvl]) * f
        s = int(enc._sizes[lvl]) * f
        out = out.at[lvl, :s].set(
            jax.lax.dynamic_slice_in_dim(params, o, s))
    return out.reshape(enc.n_levels // g, g, rows, 128)


def grid_encode_pallas_v2(enc, table: jax.Array, comps,
                          tile: int = 0, interpret: bool = False
                          ) -> jax.Array:
    """table from pack_table; comps = 3 (N,) arrays. Returns (N, L*F).

    The point tile size EQUALS the packed table's row count: Mosaic's
    dynamic_gather (sublane permute) requires index shape == operand
    shape, so each (rows, 128) table block serves exactly `rows` points
    per grid step."""
    n = comps[0].shape[0]
    d = enc.n_dims
    f = enc.n_features_per_level
    L = enc.n_levels
    G = _group(enc)
    rows = table.shape[2]
    tile = rows  # dynamic_gather constraint (see docstring)

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
        grp = pl.program_id(0)

        comps_t = [x_ref[k, :] for k in range(d)]          # (T,)
        lane_iota = jax.lax.broadcasted_iota(jnp.int32, (tile, 128), 1)

        for j in range(G):
            lvl = grp * G + j
            scale = scale_ref[lvl]
            r = res_ref[lvl]
            size = size_ref[lvl]
            is_hashed = hashed_ref[lvl]

            pos = [c * scale + 0.5 for c in comps_t]
            pos0 = [jnp.floor(p) for p in pos]
            w = [p - p0 for p, p0 in zip(pos, pos0)]
            if smoothstep:
                w = [wi * wi * (3.0 - 2.0 * wi) for wi in w]
            elif nearest:
                w = [jnp.round(wi) for wi in w]
            pos0 = [p0.astype(jnp.int32) for p0 in pos0]

            usize = size.astype(jnp.uint32)
            tbl = table_ref[0, j]                          # (rows, 128)
            accs = [jnp.zeros((tile,), jnp.float32) for _ in range(f)]
            for corner in corner_list:
                offs = [int(c) for c in corner]
                coord = [pos0[k] + offs[k] for k in range(d)]
                if tiled_wrap:
                    dd = [jnp.remainder(cd, r) for cd in coord]
                else:
                    dd = [jnp.clip(cd, 0, r - 1) for cd in coord]
                dense_idx = dd[0].astype(jnp.uint32) \
                    * stride_ref[lvl, 0].astype(jnp.uint32)
                for k in range(1, d):
                    dense_idx = dense_idx + dd[k].astype(jnp.uint32) \
                        * stride_ref[lvl, k].astype(jnp.uint32)
                hash_idx = coord[0].astype(jnp.uint32) \
                    * np.uint32(_PRIMES[0])
                for k in range(1, d):
                    hash_idx = hash_idx ^ (coord[k].astype(jnp.uint32)
                                           * np.uint32(_PRIMES[k]))
                entry = jnp.where(is_hashed == 1, hash_idx % usize,
                                  dense_idx % usize).astype(jnp.int32)
                flat0 = entry * f
                row = flat0 >> 7
                lane0 = flat0 & 127
                # per-lane sublane gather (Mosaic dynamic_gather):
                # out[i, l] = tbl[row[i], l]; requires idx shape ==
                # table shape, hence tile == rows
                row_vals = jnp.take_along_axis(
                    tbl, jnp.broadcast_to(row[:, None], (rows, 128)),
                    axis=0)                                # (rows, 128)
                weight = jnp.ones((tile,), jnp.float32)
                for k in range(d):
                    weight = weight * (w[k] if offs[k] == 1 else 1 - w[k])
                for k in range(f):
                    mask = (lane_iota == (lane0 + k)[:, None])
                    val = jnp.sum(jnp.where(mask, row_vals, 0.0), axis=1)
                    accs[k] = accs[k] + val * weight
            for k in range(f):
                out_ref[j * f + k, :] = accs[k]

    grid = (L // G, n_pad // tile)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=grid,
        in_specs=[
            pl.BlockSpec((8, tile), lambda g, t, *_: (0, t)),
            pl.BlockSpec((1, G, rows, 128), lambda g, t, *_: (g, 0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((G * f, tile), lambda g, t, *_: (g, t)),
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((L * f, n_pad), jnp.float32),
        interpret=interpret,
    )(scales, res, sizes, hashed, strides, x_p, table)

    # (L*F, N) -> (N, L*F)
    return out[:, :n].T.astype(enc.dtype)
