"""Multiresolution hash-grid encoding as a Pallas TPU kernel.

Contract-equal to GridEncoding._apply_fused (ops/grid_encoding.py). The
TPU-first insight: random gathers from HBM are XLA's job, but when one
LEVEL's table fits VMEM, staging it once and sweeping every point tile
against it turns the hash lookup into VPU-local gathers with zero HBM
gather traffic. The grid iterates (level, tile) with level OUTER, so the
level's table block stays resident across all point tiles (Pallas skips
the re-DMA when the block index doesn't change) — total table traffic =
one full sweep of the table, the optimum.

Per-level tables are padded to a common size S_max; per-level scalars
(scale, resolution, size, hashed flag, strides) ride in as scalar-
prefetch so index math happens before the body. Forward only — training
uses the autodiff path; rendering and density-grid updates use this.
Falls back to the XLA gather path when a level exceeds the VMEM budget.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_PRIMES = (1, 2654435761, 805459861)
VMEM_TABLE_BUDGET = 6 * 1024 * 1024  # bytes reserved for the level table


def supports(enc) -> bool:
    """Whether every level of this encoding fits the VMEM table budget."""
    f = enc.n_features_per_level
    s_max = int(enc._sizes.max())
    return s_max * f * 4 <= VMEM_TABLE_BUDGET and enc.n_dims in (2, 3)


def grid_encode_pallas(enc, params: jax.Array, x: jax.Array,
                       tile: int = 1024, interpret: bool = False
                       ) -> jax.Array:
    """params (total,) fp32, x (N, d) -> (N, L*F) fp32."""
    lead = x.shape[:-1]
    xf = x.reshape(-1, enc.n_dims).astype(jnp.float32)
    n = xf.shape[0]
    d = enc.n_dims
    f = enc.n_features_per_level
    L = enc.n_levels
    C = 2 ** d

    s_max = int(enc._sizes.max())
    # pack per-level tables into (L, S_max, F)
    table = jnp.zeros((L, s_max, f), jnp.float32)
    flat = params.reshape(-1, f)
    for lvl in range(L):
        o, s = int(enc._offsets[lvl]), int(enc._sizes[lvl])
        table = table.at[lvl, :s].set(
            jax.lax.dynamic_slice_in_dim(flat, o, s, axis=0))

    n_pad = (n + tile - 1) // tile * tile
    x_p = jnp.zeros((n_pad, d), jnp.float32).at[:n].set(xf)

    scales = jnp.asarray(enc._scales, jnp.float32)           # (L,)
    res = jnp.asarray(enc._resolutions, jnp.int32)
    sizes = jnp.asarray(enc._sizes, jnp.int32)
    hashed = jnp.asarray(enc._hashed.astype(np.int32))
    strides = jnp.asarray(enc._strides.astype(np.int32))     # (L, d)
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

        pos = x_ref[:] * scale + 0.5                        # (T, d)
        pos0 = jnp.floor(pos)
        w = pos - pos0
        if smoothstep:
            w = w * w * (3.0 - 2.0 * w)
        elif nearest:
            w = jnp.round(w)
        pos0 = pos0.astype(jnp.int32)

        usize = size.astype(jnp.uint32)
        tbl = table_ref[0]                                   # (S_max, F)
        acc = None
        # static unroll over the 2^d corners: no array constants in-kernel
        for corner in corner_list:
            offs = [int(c) for c in corner]
            coord_dims = [pos0[:, k] + offs[k] for k in range(d)]
            if tiled_wrap:
                dense_dims = [jnp.remainder(cd, r) for cd in coord_dims]
            else:
                dense_dims = [jnp.clip(cd, 0, r - 1) for cd in coord_dims]
            dense_idx = dense_dims[0].astype(jnp.uint32) \
                * stride_ref[lvl, 0].astype(jnp.uint32)
            for dim in range(1, d):
                dense_idx = dense_idx + dense_dims[dim].astype(jnp.uint32) \
                    * stride_ref[lvl, dim].astype(jnp.uint32)
            hash_idx = coord_dims[0].astype(jnp.uint32) \
                * np.uint32(_PRIMES[0])
            for dim in range(1, d):
                hash_idx = hash_idx ^ (coord_dims[dim].astype(jnp.uint32)
                                       * np.uint32(_PRIMES[dim]))
            idx = jnp.where(is_hashed == 1, hash_idx % usize,
                            dense_idx % usize).astype(jnp.int32)  # (T,)
            feats = tbl[idx]                                 # (T, F)
            weight = jnp.ones_like(w[:, 0])
            for k in range(d):
                weight = weight * (w[:, k] if offs[k] == 1
                                   else 1.0 - w[:, k])
            contrib = feats * weight[:, None]
            acc = contrib if acc is None else acc + contrib
        out_ref[0] = acc

    grid = (L, n_pad // tile)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile, d), lambda l, t, *_: (t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s_max, f), lambda l, t, *_: (l, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tile, f), lambda l, t, *_: (l, t, 0),
                               memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((L, n_pad, f), jnp.float32),
        interpret=interpret,
    )(scales, res, sizes, hashed, strides, x_p, table)

    # (L, N, F) -> (N, L*F)
    result = jnp.transpose(out[:, :n], (1, 0, 2)).reshape(n, L * f)
    return result.reshape(*lead, L * f).astype(enc.dtype)
