"""Camera-visibility culling of occupancy cells.

Re-implements mark_untrained_density_grid (src/testbed_nerf.cu:74-146):
a grid cell is trainable iff at least `min_count`=1 training camera sees
any of its 8 corners (corner in front of the camera and projecting inside
(0,1)^2). FTheta/LatLong/Equirect lenses are assumed to see everything.

Runs once per dataset (and when the training image set changes); chunked
over cells and looped over images on device to bound memory. The
reference's undistortion round-trip check is approximated by the plain
projection test — it only differs for extreme distortion outside the
image, where density barely matters.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..camera import (LENS_EQUIRECT, LENS_FTHETA, LENS_LATLONG, pos_to_uv)
from ..common import NERF_GRID_N_CELLS, NERF_GRIDSIZE
from .dataset import NerfSceneConfig, NerfTrainingData
from .march import morton3d_coords


def compute_visible_cells(data: NerfTrainingData, scene: NerfSceneConfig,
                          chunk: int = 1 << 17) -> jax.Array:
    """Returns (n_cascades * 128^3,) bool visibility."""
    n_cascades = scene.max_cascade + 1
    if scene.lens_mode in (LENS_FTHETA, LENS_LATLONG, LENS_EQUIRECT):
        return jnp.ones(NERF_GRID_N_CELLS * n_cascades, bool)

    w, h = data.resolution
    xforms = data.xforms_start          # (N, 3, 4)
    focal = data.focal_lengths          # (N, 2)
    pps = data.principal_points         # (N, 2)
    lens_params = data.lens_params      # (N, 7)
    lens_mode = scene.lens_mode

    @jax.jit
    def visible_chunk(flat_idx: jax.Array) -> jax.Array:
        level = flat_idx // NERF_GRID_N_CELLS
        pos_idx = flat_idx % NERF_GRID_N_CELLS
        x, y, z = morton3d_coords(pos_idx)
        base = jnp.stack([x, y, z], -1).astype(jnp.float32)
        voxel = jnp.exp2(level.astype(jnp.float32)) / NERF_GRIDSIZE
        pos = (base / NERF_GRIDSIZE - 0.5) * jnp.exp2(
            level.astype(jnp.float32))[:, None] + 0.5
        corners = jnp.stack(
            [pos + voxel[:, None] * jnp.array(
                [cx, cy, cz], jnp.float32)
             for cx in (0, 1) for cy in (0, 1) for cz in (0, 1)],
            axis=1)                      # (C, 8, 3)

        def per_image(carry, inputs):
            xform, fl, pp, lp = inputs
            rot = xform[:3, :3]
            cam_z = rot[:, 2]
            cam_o = xform[:3, 3]
            d = corners - cam_o                          # (C, 8, 3)
            dn = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
            in_front = jnp.einsum("ckj,j->ck", dn, cam_z) > 1e-4
            uv, zc = pos_to_uv(corners, (w, h), fl, xform,
                               screen_center=pp, lens_mode=lens_mode,
                               lens_params=lp)
            inside = ((uv[..., 0] > 0) & (uv[..., 0] < 1)
                      & (uv[..., 1] > 0) & (uv[..., 1] < 1))
            seen = jnp.any(in_front & inside, axis=-1)   # (C,)
            return carry | seen, None

        init = jnp.zeros(flat_idx.shape[0], bool)
        seen_any, _ = jax.lax.scan(per_image, init,
                                   (xforms, focal, pps, lens_params))
        return seen_any

    n_total = NERF_GRID_N_CELLS * n_cascades
    out = np.zeros(n_total, bool)
    for start in range(0, n_total, chunk):
        idx = jnp.arange(start, min(start + chunk, n_total))
        out[start:start + idx.shape[0]] = np.asarray(visible_chunk(idx))
    return jnp.asarray(out)
