"""Multi-chip NeRF training: rays sharded over the data mesh axis.

The TPU scaling design (SURVEY.md §2.6): parameters and the occupancy
bitfield replicate (hash table ≈ tens of MB); each chip generates,
marches, compacts, and backprops its own ray shard; gradients all-reduce
over ICI with one `psum`; the optimizer update is computed replicated so
parameters stay bit-identical per chip. shard_map makes every collective
explicit — the only cross-chip traffic is the gradient psum and scalar
stat psums, both overlapped by XLA with the backward pass.

Rendering shards pixel tiles the same way (each chip renders every
n_devices-th tile); the framebuffer gathers on host.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from .training import NerfTrainStepConfig, nerf_train_step


def make_sharded_train_step(model, optimizer, cfg: NerfTrainStepConfig,
                            aabb_min, aabb_max, mesh: Mesh,
                            axis: str = "data"):
    """Returns step(state, data, bitfield, mean_density, keys) where
    `keys` is (n_devices, 2) uint32 PRNG keys, one per chip. cfg.n_rays is
    the PER-CHIP ray count; the effective batch is n_rays * n_devices."""
    n_dev = mesh.shape[axis]

    def local_step(state, data, bitfield, mean_density, keys):
        key = keys[0]  # this shard's key

        # run sample generation + march + loss/grad locally; reuse the
        # single-chip step but intercept the optimizer: gradients must
        # all-reduce BEFORE the update so params stay replicated.
        from .sampler import (compact_samples, generate_rays, march_rays,
                              pad_samples_per_ray)
        from .training import composite_loss, _srgb_to_linear

        k_rays, k_bg = jax.random.split(key)
        rays, _ = generate_rays(k_rays, data, cfg.n_rays, aabb_min,
                                aabb_max, cfg.cone_angle, cfg.lens_mode,
                                cfg.snap_to_pixel_centers)
        ts, dts, emits = march_rays(rays, bitfield, aabb_min, aabb_max,
                                    cfg.cone_angle, cfg.max_mip,
                                    cfg.n_march, cfg.max_samples_per_ray)
        samples = compact_samples(rays, ts, dts, emits, aabb_min, aabb_max,
                                  cfg.sample_capacity)
        bg = _srgb_to_linear(jax.random.uniform(k_bg, (cfg.n_rays, 3))
                             if cfg.random_bg_color
                             else jnp.zeros((cfg.n_rays, 3)))
        exposure = data.exposures[rays.img_idx]

        def loss_fn(params):
            raw = model.apply_components(params, samples.positions,
                                         samples.dirs)
            padded = []
            for c in raw:
                pc, mask = pad_samples_per_ray(samples, c,
                                               cfg.max_samples_per_ray)
                padded.append(pc)
            dt_padded, _ = pad_samples_per_ray(
                samples, samples.dts, cfg.max_samples_per_ray)
            t_padded, _ = pad_samples_per_ray(
                samples, samples.t_mid, cfg.max_samples_per_ray)
            result = composite_loss(
                tuple(padded), mask, dt_padded, t_padded, rays, bg,
                exposure, cfg.rgb_activation, cfg.density_activation,
                cfg.loss_type, mean_density, cfg.near_distance,
                cfg.train_in_linear_colors)
            return result.loss_for_grad, result

        (_, result), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state["params"])

        # ---- the one collective: gradient all-reduce over ICI ----
        grads = jax.tree_util.tree_map(
            lambda g: jax.lax.pmean(g, axis), grads)

        from ..ops.trainer import default_l2_mask

        new_params, new_opt = optimizer.step(
            state["opt"], state["params"], grads,
            l2_mask=default_l2_mask(state["params"]))

        stats = {
            "loss": jax.lax.psum(
                jnp.sum(result.per_ray_loss), axis) / (cfg.n_rays * n_dev),
            "measured_batch_size": jax.lax.psum(
                result.measured_compacted, axis),
            "measured_batch_size_before_compaction": jax.lax.psum(
                samples.n_samples, axis),
        }
        return {"params": new_params, "opt": new_opt}, stats

    sharded = shard_map(
        local_step, mesh=mesh,
        in_specs=(P(), P(), P(), P(), P(axis)),
        out_specs=(P(), P()),
        check_rep=False)
    return jax.jit(sharded, donate_argnums=(0,))


def make_sharded_render(model, render_cfg, aabb_min, aabb_max, mesh: Mesh,
                        axis: str = "data"):
    """Tiled frame rendering with pixel tiles sharded over chips."""
    from .render import render_tile

    def local_render(params, origins, dirs, bitfield, bg):
        return render_tile(model, render_cfg, params, origins[0], dirs[0],
                           bitfield, aabb_min, aabb_max, bg)

    sharded = shard_map(
        lambda p, o, d, b, bg: jax.tree_util.tree_map(
            lambda x: x[None], local_render(p, o, d, b, bg)),
        mesh=mesh,
        in_specs=(P(), P(axis), P(axis), P(), P()),
        out_specs=P(axis),
        check_rep=False)
    return jax.jit(sharded)
