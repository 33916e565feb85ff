"""Device-resident NeRF training data: packed images + camera tensors.

The host-side loader (data/nerf_loader.py) keeps per-image numpy arrays;
this module packs them into fixed-shape device tensors for the jitted
training path:
- pixels: (N, H, W, 4) uint8 (LDR) or float16 (HDR) in HBM — stored raw
  and converted (sRGB→linear, premultiply) at gather time exactly like
  read_rgba (common_device.cuh:774-806);
- per-image camera tensors: xforms (N,3,4) start/end, focal (N,2),
  principal points (N,2), rolling shutter (N,4), lens params (N,7);
- load-time invariants from load_nerf_post (testbed_nerf.cu:2151-2239):
  HDR→Exponential rgb activation else Logistic; aabb from aabb_scale;
  max_cascade = log2(aabb_scale); cone angle 0 for unit scenes else 1/256.
"""

from __future__ import annotations

import dataclasses
import math
from functools import partial
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..camera import lens_mode_id
from ..common import NERF_CASCADES
from ..data.nerf_loader import NerfDataset

MASK_COLOR = 0x00FF00FF  # hot pink RGBA bytes marking masked-away pixels


@partial(jax.tree_util.register_dataclass,
         data_fields=["pixels", "resolutions", "xforms_start", "xforms_end",
                      "focal_lengths", "principal_points", "rolling_shutter",
                      "lens_params", "exposures", "depths", "extra_dims"],
         meta_fields=[])
@dataclasses.dataclass
class NerfTrainingData:
    """All tensors the jitted train step consumes. A pytree-of-arrays
    container (device side); static metadata lives on the testbed."""

    pixels: jax.Array            # (N, Hmax, Wmax, 4) uint8 | float16
    resolutions: jax.Array       # (N, 2) float32 true (w, h) per image
    xforms_start: jax.Array      # (N, 3, 4)
    xforms_end: jax.Array        # (N, 3, 4)
    focal_lengths: jax.Array     # (N, 2)
    principal_points: jax.Array  # (N, 2)
    rolling_shutter: jax.Array   # (N, 4)
    lens_params: jax.Array       # (N, 7)
    exposures: jax.Array         # (N, 3) log2-exposure per image
    depths: Optional[jax.Array]  # (N, H, W) float32 or None
    extra_dims: Optional[jax.Array]  # (N, n_extra) latent codes or None

    @property
    def n_images(self) -> int:
        return self.pixels.shape[0]

    @property
    def resolution(self) -> Tuple[int, int]:
        """(W, H)."""
        return self.pixels.shape[2], self.pixels.shape[1]


@dataclasses.dataclass
class NerfSceneConfig:
    """Static, trace-time constants derived at load (load_nerf_post)."""

    aabb_scale: int
    max_cascade: int
    cone_angle_constant: float
    rgb_activation: str
    density_activation: str
    aabb_min: np.ndarray
    aabb_max: np.ndarray
    lens_mode: int
    near_distance: float
    n_extra_dims: int


def scene_config_from_dataset(ds: NerfDataset) -> NerfSceneConfig:
    aabb_scale = ds.aabb_scale
    if aabb_scale & (aabb_scale - 1) or aabb_scale > (1 << (NERF_CASCADES - 1)):
        raise ValueError(
            f"aabb_scale must be a power of two <= {1 << (NERF_CASCADES - 1)}"
            f", got {aabb_scale} (testbed_nerf.cu:2206-2217)")
    side = min(aabb_scale, 128)
    aabb_min = np.full(3, 0.5 - side / 2, np.float32)
    aabb_max = np.full(3, 0.5 + side / 2, np.float32)
    return NerfSceneConfig(
        aabb_scale=aabb_scale,
        max_cascade=int(math.log2(aabb_scale)) if aabb_scale > 1 else 0,
        # unit-cube scenes use fixed stepping, larger ones exponential
        cone_angle_constant=0.0 if aabb_scale <= 1 else 1.0 / 256.0,
        rgb_activation="Exponential" if ds.is_hdr else "Logistic",
        density_activation="Exponential",
        aabb_min=aabb_min,
        aabb_max=aabb_max,
        lens_mode=lens_mode_id(ds.metadata[0].lens.mode),
        near_distance=0.0,
        n_extra_dims=ds.n_extra_dims,
    )


def pack_training_data(ds: NerfDataset, key: Optional[jax.Array] = None
                       ) -> NerfTrainingData:
    """Pack per-image host arrays into fixed-shape device tensors.

    Mixed-resolution datasets (the reference's nerf_loader is fully
    per-image) pack as pad-to-max: pixels become (N, Hmax, Wmax, 4) and
    `resolutions` records each image's true (w, h). All uv math is
    resolution-relative, so the padded region is never sampled."""
    res_list = [m.resolution for m in ds.metadata]  # (w, h) per image
    w_max = max(r[0] for r in res_list)
    h_max = max(r[1] for r in res_list)
    mixed = len(set(res_list)) != 1

    if not mixed:
        imgs = np.stack(ds.images)  # (N, H, W, 4)
    else:
        imgs = np.zeros((len(ds.images), h_max, w_max, 4),
                        ds.images[0].dtype)
        for i, im in enumerate(ds.images):
            imgs[i, :im.shape[0], :im.shape[1]] = im

    depths = None
    if any(d is not None for d in ds.depths):
        depths = np.zeros((len(ds.images), h_max, w_max), np.float32)
        for i, d in enumerate(ds.depths):
            if d is not None:
                depths[i, :d.shape[0], :d.shape[1]] = d

    extra = None
    if ds.n_extra_dims:
        if ds.has_light_dirs:
            extra = np.stack([m.light_dir for m in ds.metadata])
        else:
            # learnable latents init N(0, 0.1) like reset_extra_dims
            key = key if key is not None else jax.random.PRNGKey(0)
            extra = 0.1 * np.asarray(jax.random.normal(
                key, (ds.n_images, ds.n_extra_learnable_dims)))

    return NerfTrainingData(
        pixels=jnp.asarray(imgs),
        resolutions=jnp.asarray(np.asarray(res_list, np.float32)),
        xforms_start=jnp.asarray(ds.xforms_start),
        xforms_end=jnp.asarray(ds.xforms_end),
        focal_lengths=jnp.asarray(
            np.stack([m.focal_length for m in ds.metadata])),
        principal_points=jnp.asarray(
            np.stack([m.principal_point for m in ds.metadata])),
        rolling_shutter=jnp.asarray(
            np.stack([m.rolling_shutter for m in ds.metadata])),
        lens_params=jnp.asarray(
            np.stack([m.lens.params for m in ds.metadata])),
        exposures=jnp.zeros((ds.n_images, 3), jnp.float32),
        depths=jnp.asarray(depths) if depths is not None else None,
        extra_dims=jnp.asarray(extra) if extra is not None else None,
    )


def read_rgba(pixels: jax.Array, img_idx: jax.Array, px: jax.Array
              ) -> jax.Array:
    """Gather + convert pixels like read_rgba (common_device.cuh:774-806).

    pixels: (N, H, W, 4) uint8 or float16. px: (..., 2) int (x, y).
    uint8: sRGB→linear, alpha-premultiplied; hot-pink mask → -1s."""
    h, w = pixels.shape[1], pixels.shape[2]
    x = jnp.clip(px[..., 0], 0, w - 1)
    y = jnp.clip(px[..., 1], 0, h - 1)
    raw = pixels[img_idx, y, x]  # (..., 4)
    if pixels.dtype == jnp.uint8:
        val = raw.astype(jnp.float32) / 255.0
        rgb, alpha = val[..., :3], val[..., 3:4]
        lin = jnp.where(rgb <= 0.04045, rgb / 12.92,
                        ((rgb + 0.055) / 1.055) ** 2.4)
        out = jnp.concatenate([lin * alpha, alpha], axis=-1)
        masked = ((raw[..., 0] == 255) & (raw[..., 1] == 0)
                  & (raw[..., 2] == 255) & (raw[..., 3] == 0))
        return jnp.where(masked[..., None], -1.0, out)
    return raw.astype(jnp.float32)
