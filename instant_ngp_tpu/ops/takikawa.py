"""Takikawa (NGLOD-style) octree feature encoding.

Re-implements include/neural-graphics-primitives/takikawa_encoding.cuh
(468 LoC): per level from `starting_level` to the octree depth, find the
octree cell containing x, trilinearly interpolate the features stored at
its 8 shared corner vertices (dual nodes), and concatenate (or sum) the
per-level features. Points outside the octree at some level contribute
zeros there. Used by configs/sdf/takikawa.json.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..geom.triangle_octree import TriangleOctree
from .encodings import Encoding


class TakikawaEncoding(Encoding):
    def __init__(self, octree: TriangleOctree, starting_level: int = 4,
                 n_features_per_level: int = 4,
                 sum_instead_of_concat: bool = False,
                 dtype=jnp.float32):
        self.octree = octree
        self.starting_level = starting_level
        self.n_features_per_level = n_features_per_level
        self.sum_instead_of_concat = sum_instead_of_concat
        self.n_dims = 3
        self.dtype = dtype
        self.n_active_levels = octree.depth - starting_level
        assert self.n_active_levels > 0, "octree shallower than start level"
        self.n_output_dims = n_features_per_level * (
            1 if sum_instead_of_concat else self.n_active_levels)

    @property
    def n_params(self) -> int:
        return self.octree.n_vertices * self.n_features_per_level

    def init(self, key: jax.Array) -> jax.Array:
        # matches tcnn grid-style U(-1e-4, 1e-4) init
        return jax.random.uniform(key, (self.n_params,), jnp.float32,
                                  -1e-4, 1e-4)

    def apply(self, params, x: jax.Array, **kwargs) -> jax.Array:
        lead = x.shape[:-1]
        xf = x.reshape(-1, 3).astype(jnp.float32)
        f = self.n_features_per_level
        table = params.reshape(-1, f)

        outs = []
        for li, level in enumerate(range(self.starting_level,
                                         self.octree.depth)):
            res = 1 << level
            pos = xf * res
            cell = jnp.clip(jnp.floor(pos).astype(jnp.int32), 0, res - 1)
            w = pos - cell.astype(jnp.float32)
            ids, occupied = self.octree.vertex_indices(level, cell)
            feats = table[ids]                       # (N, 8, F)
            # corner order matches vertex_indices: x-major (cx, cy, cz)
            weights = []
            for cx in (0, 1):
                for cy in (0, 1):
                    for cz in (0, 1):
                        wx = w[:, 0] if cx else 1 - w[:, 0]
                        wy = w[:, 1] if cy else 1 - w[:, 1]
                        wz = w[:, 2] if cz else 1 - w[:, 2]
                        weights.append(wx * wy * wz)
            weight = jnp.stack(weights, axis=-1)     # (N, 8)
            out = jnp.sum(feats * weight[..., None], axis=1)
            out = jnp.where(occupied[:, None], out, 0.0)
            outs.append(out)
        if self.sum_instead_of_concat:
            result = sum(outs)
        else:
            result = jnp.concatenate(outs, axis=-1)
        return result.reshape(*lead, self.n_output_dims).astype(self.dtype)
