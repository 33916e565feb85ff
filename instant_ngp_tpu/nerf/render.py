"""NeRF rendering: occupancy-guided marching + volumetric compositing.

Replaces the reference's wavefront tracer (NerfTracer::trace,
src/testbed_nerf.cu:1639-1795; render_nerf :1827-1987). The CUDA design
compacts alive rays on device with host readbacks every iteration
(:1688) — a TPU anti-pattern. Here rendering reuses the training
machinery: pixels are tiled into fixed-size ray batches; each batch is
marched with the same fixed-trip occupancy-skipping scan, compacted by
prefix sum, evaluated densely, and composited with min-transmittance
early-out (render default 1e-2, eval 1e-4 — nerf.h:173, run.py:230).
The march is the analytic candidate grid (sampler.march_rays) and the
composite runs directly on it. One jitted program per tile; zero host
syncs inside a frame.

Render modes (common.h:56-67): Shade, Depth, Positions, Normals (autodiff
input gradient of density, like network->input_gradient :1724), AO.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..camera import uv_to_ray
from .march import (advance_n_steps, ray_intersect_aabb, warp_position)
from .model import NerfNetwork, network_to_density, network_to_rgb
from .sampler import RayBatch, compact_samples, march_rays


class RenderConfig(NamedTuple):
    n_rays: int              # tile size (static)
    n_march: int
    max_samples_per_ray: int
    sample_capacity: int
    cone_angle: float
    max_mip: int
    rgb_activation: str
    density_activation: str
    min_transmittance: float = 1e-2
    render_mode: str = "Shade"


def render_tile(model: NerfNetwork, cfg: RenderConfig, params,
                origins: jax.Array, dirs: jax.Array, bitfield: jax.Array,
                aabb_min, aabb_max, bg_color: jax.Array,
                extra_dims: Optional[jax.Array] = None
                ) -> Dict[str, jax.Array]:
    """Render one tile of rays. origins/dirs (R, 3) in NGP space, dirs
    normalized; bg_color (R, 3) linear. Returns rgba + depth."""
    n_rays = origins.shape[0]
    tmin, tmax = ray_intersect_aabb(origins, dirs, aabb_min, aabb_max)
    tmin = jnp.maximum(tmin, 0.0)
    valid = tmax >= tmin
    t_start = advance_n_steps(tmin, cfg.cone_angle, 0.5)

    rays = RayBatch(origins, dirs, t_start,
                    jnp.zeros(n_rays, jnp.int32),
                    jnp.zeros((n_rays, 2)),
                    jnp.zeros((n_rays, 4)), valid)
    ts, dts, emits = march_rays(rays, bitfield, aabb_min, aabb_max,
                                cfg.cone_angle, cfg.max_mip, cfg.n_march,
                                cfg.max_samples_per_ray)
    # depth-major compaction: a query-budget capacity sheds the DEEP
    # tail of every ray uniformly (the reference bounds each compaction
    # round by target_n_queries=2M, testbed_nerf.cu:1697-1698) — the
    # network never evaluates tile*max_k mostly-padding samples
    samples = compact_samples(rays, ts, dts, emits, aabb_min, aabb_max,
                              cfg.sample_capacity, order="depth",
                              cone_angle=cfg.cone_angle)

    extra_flat = None
    if extra_dims is not None:
        extra_flat = jnp.broadcast_to(
            extra_dims[None], (cfg.sample_capacity, extra_dims.shape[-1]))

    if cfg.render_mode == "Normals":
        # d(density)/dpos via autodiff (input_gradient equivalent),
        # component-separated like everything else
        def raw_density(px, py, pz):
            if hasattr(model.pos_encoding, "apply_components"):
                feats = model.pos_encoding.apply_components(
                    params["pos_encoding"], [px, py, pz])
            else:
                feats = model.pos_encoding.apply(
                    params["pos_encoding"], jnp.stack([px, py, pz], -1))
            return jnp.sum(model.density_net.apply(
                params["density_net"], feats)[..., 0])

        g = jax.grad(raw_density, argnums=(0, 1, 2))(*samples.positions)
        norm = jnp.sqrt(g[0] ** 2 + g[1] ** 2 + g[2] ** 2)
        normals = [-gi / jnp.maximum(norm, 1e-9) for gi in g]
        _, _, _, sig = model.apply_components(
            params, samples.positions, samples.dirs, extra_flat)
        raw_ch = (*normals, sig)
        shade_is_raw = True
    else:
        raw_ch = model.apply_components(params, samples.positions,
                                        samples.dirs, extra_flat)
        shade_is_raw = False

    # composite in the (R, M) candidate domain: the network's flat
    # outputs scatter back once per channel; mask/dt/t are march outputs
    m_cand = ts.shape[1]
    kept = samples.cand_slot < cfg.sample_capacity

    def to_cand(v):
        plane = jnp.zeros(n_rays * m_cand + 1, v.dtype).at[
            samples.cand_src].set(v, mode="drop")
        return plane[:n_rays * m_cand].reshape(n_rays, m_cand)

    padded = [to_cand(c) for c in raw_ch]
    mask = kept
    t_padded = ts

    if shade_is_raw:
        rgb_ch = [c * 0.5 + 0.5 for c in padded[:3]]
    else:
        rgb_ch = [network_to_rgb(c, cfg.rgb_activation)
                  for c in padded[:3]]
    sigma = network_to_density(padded[3], cfg.density_activation)
    dt = dts
    alpha = jnp.where(mask, 1.0 - jnp.exp(-sigma * dt), 0.0)

    one_minus = 1.0 - alpha
    t_prefix = jnp.cumprod(one_minus, axis=-1)
    T_before = jnp.concatenate(
        [jnp.ones((n_rays, 1), alpha.dtype), t_prefix[:, :-1]], axis=-1)
    alive = mask & (T_before >= cfg.min_transmittance)
    weight = jnp.where(alive, alpha * T_before, 0.0)

    if cfg.render_mode == "Positions":
        rgb_ch = [to_cand(p) for p in samples.positions]
    elif cfg.render_mode == "Depth":
        rgb_ch = [t_padded] * 3
    elif cfg.render_mode == "AO":
        # ambient-occlusion-style view: pure white medium — the image is
        # the accumulated opacity profile (ERenderMode::AO analog)
        rgb_ch = [jnp.ones_like(t_padded)] * 3
    elif cfg.render_mode == "EncodingVis":
        # visualize the first three hash-encoding features at the samples
        if hasattr(model.pos_encoding, "apply_components"):
            feats = model.pos_encoding.apply_components(
                params["pos_encoding"], list(samples.positions))
        else:
            feats = model.pos_encoding.apply(
                params["pos_encoding"], jnp.stack(samples.positions, -1))
        vis = feats[..., :3] * 20.0 + 0.5
        rgb_ch = [to_cand(vis[..., k]) for k in range(3)]

    ray_ch = [jnp.sum(weight * c, axis=1) for c in rgb_ch]
    opacity = jnp.sum(weight, axis=1)
    depth_ray = jnp.sum(weight * t_padded, axis=1)
    # opacity-normalized depth looks wrong at silhouettes; reference keeps
    # the weighted sum, matching composite_kernel_nerf
    ray_ch = [c + (1.0 - opacity) * bg_color[:, k]
              for k, c in enumerate(ray_ch)]

    if cfg.render_mode == "Cost":
        n_steps = jnp.sum(mask, axis=1).astype(jnp.float32) / 128.0
        ray_ch = [n_steps] * 3

    rgb_ray = jnp.stack(ray_ch, axis=-1)
    return {
        "rgb": jnp.where(valid[..., None], rgb_ray, bg_color),
        "alpha": jnp.where(valid, opacity, 0.0),
        "depth": jnp.where(valid, depth_ray, 0.0),
        "n_samples": samples.n_samples,
    }


def camera_rays_for_frame(width: int, height: int, focal_length,
                          camera_matrix, screen_center=(0.5, 0.5),
                          lens_mode: int = 0, lens_params=None,
                          distortion_map: Optional[jax.Array] = None,
                          jitter: Optional[jax.Array] = None,
                          aperture_size: float = 0.0, focus_z: float = 1.0,
                          aperture_key: Optional[jax.Array] = None
                          ) -> Tuple[jax.Array, jax.Array]:
    """(H*W, 3) origins + normalized dirs for a full frame. `jitter` (2,)
    is the subpixel offset for spp accumulation (default pixel centers).

    aperture_size/focus_z: depth of field (init_rays_with_payload_kernel,
    testbed_nerf.cu:1392-1399 — per-pixel disk-sampled origin offset with
    the direction refocused on the focus plane). aperture_key draws the
    per-pixel disk samples; required when aperture_size > 0."""
    x = jnp.arange(width, dtype=jnp.float32)
    y = jnp.arange(height, dtype=jnp.float32)
    off = jnp.asarray([0.5, 0.5]) if jitter is None else jitter
    uv = jnp.stack(jnp.meshgrid((x + off[0]) / width,
                                (y + off[1]) / height, indexing="xy"),
                   axis=-1).reshape(-1, 2)
    ap_samples = None
    if aperture_size != 0.0 and aperture_key is not None:
        ap_samples = jax.random.uniform(aperture_key, (uv.shape[0], 2))
    origins, dirs, _ = uv_to_ray(
        uv, (width, height), jnp.asarray(focal_length, jnp.float32),
        jnp.asarray(camera_matrix, jnp.float32), screen_center,
        lens_mode=lens_mode, lens_params=lens_params,
        distortion_map=distortion_map,
        aperture_size=aperture_size, focus_z=focus_z,
        aperture_samples=ap_samples)
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    return origins, dirs


def hsv_to_rgb(h: jax.Array, s: jax.Array, v: jax.Array):
    """HSV→RGB per channel (common_device.cuh:691-712)."""
    h6 = (h % 1.0) * 6.0
    c = v * s
    x = c * (1.0 - jnp.abs(h6 % 2.0 - 1.0))
    m = v - c
    i = jnp.floor(h6).astype(jnp.int32) % 6
    r = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4], [c, x, 0.0, 0.0, x], c)
    g = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4], [x, c, c, x, 0.0], 0.0)
    b = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4], [0.0, 0.0, x, c, c], x)
    return r + m, g + m, b + m


def distortion_flow_image(width: int, height: int, focal_length,
                          camera_matrix, screen_center=(0.5, 0.5),
                          lens_mode: int = 0, lens_params=None,
                          distortion_map: Optional[jax.Array] = None
                          ) -> jax.Array:
    """ERenderMode::Distortion (testbed_nerf.cu:1458-1467): cast the
    distorted ray per pixel, project ray(1.0) back through the *pinhole*
    model, and visualize the uv displacement ×64 as an HSV flow field
    (hue = direction, value = magnitude; to_rgb common_device.cuh:714)."""
    from ..camera import pos_to_uv

    x = jnp.arange(width, dtype=jnp.float32)
    y = jnp.arange(height, dtype=jnp.float32)
    uv = jnp.stack(jnp.meshgrid((x + 0.5) / width, (y + 0.5) / height,
                                indexing="xy"), axis=-1).reshape(-1, 2)
    fl = jnp.asarray(focal_length, jnp.float32)
    cam = jnp.asarray(camera_matrix, jnp.float32)
    origins, dirs, _ = uv_to_ray(
        uv, (width, height), fl, cam, screen_center,
        lens_mode=lens_mode, lens_params=lens_params,
        distortion_map=distortion_map)
    uv_after, _ = pos_to_uv(origins + dirs, (width, height), fl, cam,
                            screen_center)
    d = (uv_after - uv) * 64.0
    mag = jnp.sqrt(d[:, 0] ** 2 + d[:, 1] ** 2)
    hue = jnp.arctan2(d[:, 1], d[:, 0]) / (2.0 * jnp.pi) + 0.5
    r, g, b = hsv_to_rgb(hue, jnp.ones_like(mag), mag)
    rgba = jnp.stack([r, g, b, jnp.ones_like(mag)], axis=-1)
    return rgba.reshape(height, width, 4)
