"""End-to-end NeRF training tests on a tiny synthetic scene (CPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from instant_ngp_tpu.data.nerf_loader import (FrameMetadata, Lens,
                                              NerfDataset)
from instant_ngp_tpu.nerf.testbed_nerf import NerfTestbed

CFG = {
    "loss": {"otype": "Huber"},
    "optimizer": {"otype": "Ema", "decay": 0.95, "nested": {
        "otype": "ExponentialDecay", "decay_start": 20000,
        "decay_interval": 10000, "decay_base": 0.33, "nested": {
            "otype": "Adam", "learning_rate": 1e-2, "beta1": 0.9,
            "beta2": 0.99, "epsilon": 1e-15, "l2_reg": 1e-6}}},
    "encoding": {"otype": "HashGrid", "n_levels": 4,
                 "n_features_per_level": 2, "log2_hashmap_size": 12,
                 "base_resolution": 16},
    "network": {"otype": "FullyFusedMLP", "activation": "ReLU",
                "output_activation": "None", "n_neurons": 32,
                "n_hidden_layers": 1},
    "dir_encoding": {"otype": "SphericalHarmonics", "degree": 4},
    "rgb_network": {"otype": "FullyFusedMLP", "activation": "ReLU",
                    "output_activation": "None", "n_neurons": 32,
                    "n_hidden_layers": 1},
}


def look_at(eye, center, up=np.array([0, 1, 0], np.float32)):
    f = center - eye
    f = f / np.linalg.norm(f)
    r = np.cross(f, up)
    r = r / np.linalg.norm(r)
    u = np.cross(f, r)
    return np.stack([r, u, f, eye], axis=1).astype(np.float32)


def make_dataset(n_cams=4, size=32):
    imgs, xforms, metas = [], [], []
    for i in range(n_cams):
        ang = i / n_cams * 2 * np.pi
        eye = np.array([0.5 + 0.8 * np.cos(ang), 0.6,
                        0.5 + 0.8 * np.sin(ang)], np.float32)
        m = look_at(eye, np.array([0.5, 0.5, 0.5], np.float32))
        xforms.append(m)
        yy, xx = np.mgrid[0:size, 0:size]
        r2 = (xx - size / 2) ** 2 + (yy - size / 2) ** 2
        img = np.zeros((size, size, 4), np.uint8)
        hit = r2 < (size / 4) ** 2
        img[hit] = [180, 60, 60, 255]
        imgs.append(img)
        metas.append(FrameMetadata(
            (size, size), np.array([40.0, 40.0], np.float32),
            np.array([0.5, 0.5], np.float32), np.zeros(4, np.float32),
            Lens()))
    ds = NerfDataset(paths=[f"im{i}" for i in range(n_cams)], images=imgs,
                     depths=[None] * n_cams, rays=[None] * n_cams,
                     metadata=metas, xforms_start=np.stack(xforms),
                     xforms_end=np.stack(xforms))
    ds.aabb_scale = 1
    return ds


@pytest.fixture(scope="module")
def testbed():
    tb = NerfTestbed(make_dataset(), CFG, compute_dtype=jnp.float32)
    tb.target_batch_size = 1 << 12
    tb.rays_per_batch = 256
    tb.n_march = 96
    tb.max_samples_per_ray = 32
    tb.density_samples_override = 1 << 14
    return tb


def test_nerf_training_loss_decreases(testbed):
    testbed.train(1)
    first = testbed.loss_scalar
    testbed.train(26)
    # converges well below the untrained level (~0.08 on this scene);
    # strict per-step decrease is noisy once at the plateau
    assert testbed.loss_scalar < max(0.06, first * 0.8)
    assert testbed.measured_batch_size > 0


def test_nerf_density_grid_becomes_occupied(testbed):
    # after training steps, some cells must be marked occupied
    occupied_bits = np.unpackbits(np.asarray(testbed.bitfield)).sum()
    assert occupied_bits > 0


def test_extra_dims_train_and_render(tmp_path):
    """Per-image learnable latents: trained per step (reference
    compute_extra_dims_gradient_train_nerf, testbed_nerf.cu:1271 +
    VarAdam :2577-2598) and conditioning renders via the rendering
    extra dims (get_rendering_extra_dims :3206-3266)."""
    ds = make_dataset()
    ds.n_extra_learnable_dims = 2
    cfg = dict(CFG)
    # latent-carrying datasets need the Composite dir encoding the
    # config zoo ships (SH for the direction + Identity for the extras,
    # reference configs/nerf/base.json:37-48)
    cfg["dir_encoding"] = {"otype": "Composite", "nested": [
        {"n_dims_to_encode": 3, "otype": "SphericalHarmonics",
         "degree": 4},
        {"otype": "Identity"}]}
    tb = NerfTestbed(ds, cfg, compute_dtype=jnp.float32)
    tb.target_batch_size = 1 << 12
    tb.rays_per_batch = 256
    tb.n_march = 96
    tb.max_samples_per_ray = 32
    tb.density_samples_override = 1 << 14
    assert tb.optimize_extra_dims and tb.data.extra_dims is not None
    init_latents = np.asarray(tb.data.extra_dims).copy()
    tb.train(8)
    trained = np.asarray(tb.data.extra_dims)
    assert not np.allclose(trained, init_latents), \
        "latents did not train"

    # rendering defaults to view 0's trained latent and responds to it
    img_v0 = tb.render_training_view(0, width=24, height=24)
    assert np.isfinite(img_v0).all()
    tb.set_rendering_extra_dims(np.full(2, 25.0, np.float32))
    cam = tb.effective_xform(0)
    img_big = tb.render_frame(24, 24, cam, spp=1)
    tb.set_rendering_extra_dims_from_training_view(0)
    img_view0 = tb.render_frame(24, 24, cam, spp=1)
    assert not np.allclose(img_big, img_view0), \
        "render ignores the rendering extra dims"

    # snapshot round-trips the trained latents (dataset-identity gated)
    path = str(tmp_path / "latents.ingp")
    tb.save_snapshot(path)
    from instant_ngp_tpu.data.snapshot import load_snapshot

    ds2 = make_dataset()
    ds2.n_extra_learnable_dims = 2
    tb2 = NerfTestbed(ds2, cfg, compute_dtype=jnp.float32)
    tb2.load_snapshot_state(load_snapshot(path))
    np.testing.assert_allclose(np.asarray(tb2.data.extra_dims), trained,
                               atol=1e-6)


def test_nerf_render_and_snapshot(testbed, tmp_path):
    img = testbed.render_training_view(0, width=32, height=32)
    assert img.shape == (32, 32, 4)
    assert np.isfinite(img).all()

    path = str(tmp_path / "nerf.ingp")
    testbed.save_snapshot(path)
    from instant_ngp_tpu.data.snapshot import load_snapshot

    tb2 = NerfTestbed(make_dataset(), CFG, compute_dtype=jnp.float32)
    tb2.max_samples_per_ray = testbed.max_samples_per_ray
    tb2.n_march = testbed.n_march
    tb2.load_snapshot_state(load_snapshot(path))
    img2 = tb2.render_training_view(0, width=32, height=32)
    np.testing.assert_allclose(img, img2, atol=1e-5)


def test_sampler_segments_are_consistent():
    from instant_ngp_tpu.nerf.sampler import (compact_samples,
                                              generate_rays, march_rays)

    tb = NerfTestbed(make_dataset(), CFG, compute_dtype=jnp.float32)
    tb.density_samples_override = 1 << 12
    tb.training_prep()
    aabb_min = jnp.asarray(tb.scene.aabb_min)
    aabb_max = jnp.asarray(tb.scene.aabb_max)
    rays, _ = generate_rays(jax.random.PRNGKey(0), tb.data, 128, aabb_min,
                            aabb_max, 0.0, tb.scene.lens_mode)
    ts, dts, emits = march_rays(rays, tb.bitfield, aabb_min, aabb_max,
                                0.0, tb.scene.max_cascade, 64, 16)
    s = compact_samples(rays, ts, dts, emits, aabb_min, aabb_max, 2048)
    base = np.asarray(s.ray_base)
    count = np.asarray(s.ray_count)
    n = int(s.n_samples)
    # segments tile [0, n) in order without overlap
    assert base[0] == 0
    np.testing.assert_array_equal(base[1:], (base + count)[:-1])
    assert base[-1] + count[-1] == n
    # all valid sample positions are inside the warp cube
    pos = np.stack([np.asarray(p) for p in s.positions], -1)[:n]
    assert (pos >= -1e-5).all() and (pos <= 1 + 1e-5).all()
    # ray ids of each segment match
    rid = np.asarray(s.ray_id)
    for r in [0, 17, 100]:
        seg = rid[base[r]:base[r] + count[r]]
        assert (seg == r).all()


def test_derived_n_march_is_lane_aligned_and_covers_span():
    """n_march derivation: lane-aligned multiple of 128 (NOT a power of
    two — it never adapts, so pow2 bought no recompile bound and only
    inflated the (R, n_march) planes), bounded to [128, 1024], and large
    enough for the sampled worst-case stepping span."""
    import jax.numpy as jnp

    from instant_ngp_tpu.nerf.march import (ray_intersect_aabb,
                                            to_stepping_space)
    from instant_ngp_tpu.nerf.sampler import build_rays

    tb = NerfTestbed(make_dataset(), CFG, compute_dtype=jnp.float32)
    m = tb._derive_n_march()
    assert m % 128 == 0 and 128 <= m <= 1024
    # sampled span must fit (the derivation adds a 10% + 32 margin)
    lo = jnp.asarray(tb.scene.aabb_min)
    hi = jnp.asarray(tb.scene.aabb_max)
    uv = jnp.full((tb.data.n_images, 2), 0.5)
    idx = jnp.arange(tb.data.n_images)
    o, d, ok = build_rays(tb.data, idx, uv, jnp.zeros(idx.shape[0]),
                          tb.scene.lens_mode)
    tmin, tmax = ray_intersect_aabb(o, d, lo, hi)
    cone = tb.scene.cone_angle_constant
    span = jnp.where(ok & (tmax > jnp.maximum(tmin, 0.0)),
                     to_stepping_space(tmax, cone)
                     - to_stepping_space(jnp.maximum(tmin, 0.0), cone),
                     0.0)
    assert m >= float(jnp.max(span)) or m == 1024


def test_depth_major_compaction_sheds_deep_tail_uniformly():
    """order="depth" (render path): when capacity truncates, every ray
    keeps its EARLY samples and only the deep tail is shed — the
    reference's target_n_queries budget semantics
    (testbed_nerf.cu:1697-1698) — unlike ray-major order, which
    starves whole late rays."""
    from instant_ngp_tpu.nerf.sampler import (compact_samples,
                                              generate_rays, march_rays)

    tb = NerfTestbed(make_dataset(), CFG, compute_dtype=jnp.float32)
    tb.density_samples_override = 1 << 12
    tb.training_prep()
    aabb_min = jnp.asarray(tb.scene.aabb_min)
    aabb_max = jnp.asarray(tb.scene.aabb_max)
    rays, _ = generate_rays(jax.random.PRNGKey(0), tb.data, 128, aabb_min,
                            aabb_max, 0.0, tb.scene.lens_mode)
    ts, dts, emits = march_rays(rays, tb.bitfield, aabb_min, aabb_max,
                                0.0, tb.scene.max_cascade, 64, 16)
    total = int(jnp.sum(emits))
    cap = max(total // 2, 1)  # force truncation
    s = compact_samples(rays, ts, dts, emits, aabb_min, aabb_max, cap,
                        order="depth")
    assert int(s.n_samples) == cap

    e = np.asarray(emits)
    kept = np.asarray(s.cand_slot) < cap          # (R, M) kept mask
    assert kept.sum() == cap
    # kept set is depth-prefix-closed: within the global depth-major
    # ordering, every kept candidate outranks every dropped one —
    # i.e. for each ray the kept samples are its EARLIEST emitted ones
    for r in [0, 31, 64, 100]:
        emitted = np.nonzero(e[r])[0]
        kr = kept[r][emitted]
        if kr.any():
            last_kept = np.nonzero(kr)[0].max()
            assert kr[:last_kept + 1].all(), \
                f"ray {r} has a dropped sample before a kept one"
    # exact semantics: kept = the `cap` lowest-ranked emitted candidates
    # in depth-major (step-k-major) order
    rank_np = (np.cumsum(e.T.reshape(-1)) - e.T.reshape(-1)) \
        .reshape(e.shape[1], e.shape[0]).T
    np.testing.assert_array_equal(kept, (rank_np < cap) & (e > 0))
    # per-ray counts agree with the kept mask
    np.testing.assert_array_equal(np.asarray(s.ray_count), kept.sum(1))


def test_scanned_multi_step_dispatch_matches_eager():
    """steps_per_dispatch>1 (one lax.scan program per block) must be
    bit-identical to the eager per-step path."""
    def mk():
        tb = NerfTestbed(make_dataset(), CFG, compute_dtype=jnp.float32)
        tb.target_batch_size = 1 << 12
        tb.rays_per_batch = 256
        tb.n_march = 96
        tb.max_samples_per_ray = 32
        tb.density_samples_override = 1 << 14
        tb.adapt_ray_batch = False
        return tb

    tb1 = mk()
    tb1.steps_per_dispatch = 1   # eager reference (scanned is default)
    tb1.train(12)
    tb2 = mk()
    tb2.steps_per_dispatch = 4
    tb2.train(12)
    assert tb1.training_step == tb2.training_step == 12
    p1 = np.asarray(tb1.state["params"]["pos_encoding"])
    p2 = np.asarray(tb2.state["params"]["pos_encoding"])
    np.testing.assert_array_equal(p1, p2)
    g1 = np.asarray(tb1.density_grid)
    g2 = np.asarray(tb2.density_grid)
    np.testing.assert_array_equal(g1, g2)


def test_stochastic_corner_schedule_switches_to_exact():
    """stochastic_corners_until: training encodes with the 1-corner
    estimator before the switch step and the exact d-linear path after
    (coarse-to-fine variance schedule), in both the eager and scanned
    dispatch paths."""
    tb = NerfTestbed(make_dataset(), CFG, compute_dtype=jnp.float32)
    tb.target_batch_size = 1 << 10
    tb.rays_per_batch = 256
    tb.n_march = 96
    tb.max_samples_per_ray = 32
    tb.density_samples_override = 1 << 10
    tb.stochastic_corners = True
    tb.stochastic_corners_until = 6
    tb.steps_per_dispatch = 1    # exercise the eager path explicitly
    assert tb._stoch_now()
    tb.train(5)
    assert tb._stoch_now()          # step 5 < 6: still stochastic
    tb.train(2)
    assert not tb._stoch_now()      # step 7 >= 6: exact
    # both variants were compiled as distinct programs
    stoch_keys = {k[-1] for k in tb._train_fns}
    assert stoch_keys == {True, False}
    loss = tb.train(2)
    assert np.isfinite(loss)

    # scanned path: blocks clamp at the switch boundary
    tb2 = NerfTestbed(make_dataset(), CFG, compute_dtype=jnp.float32)
    tb2.target_batch_size = 1 << 10
    tb2.rays_per_batch = 256
    tb2.n_march = 96
    tb2.max_samples_per_ray = 32
    tb2.density_samples_override = 1 << 10
    tb2.stochastic_corners = True
    tb2.stochastic_corners_until = 6
    tb2.steps_per_dispatch = 4
    tb2.train(9)
    assert tb2.training_step == 9
    scan_stoch = {k[-1] for k in tb2._train_fns if k[0] == "scan"}
    assert scan_stoch == {True, False}


def test_camera_and_exposure_optimization_updates_offsets():
    tb = NerfTestbed(make_dataset(), CFG, compute_dtype=jnp.float32)
    tb.target_batch_size = 1 << 12
    tb.rays_per_batch = 256
    tb.n_march = 96
    tb.max_samples_per_ray = 32
    tb.density_samples_override = 1 << 14
    tb.optimize_extrinsics = True
    tb.optimize_exposure = True
    tb.n_steps_between_cam_updates = 4
    tb.train(10)
    assert np.abs(tb.cam_pos_offset).max() > 0
    assert np.abs(tb.cam_rot_offset).max() > 0
    assert np.abs(np.asarray(tb.data.exposures)).max() > 0
    # offsets stay small on a consistent scene
    assert np.abs(tb.cam_pos_offset).max() < 0.2
    # rendering uses the adjusted camera without error
    img = tb.render_training_view(0, width=16, height=16)
    assert np.isfinite(img).all()


def test_scanned_camera_optimization_matches_eager():
    """Camera/exposure optimization inside the scanned block (gradients
    summed over the scan, host Adam on the same boundary) must match
    the eager per-step accumulation."""
    def mk(k):
        tb = NerfTestbed(make_dataset(), CFG, compute_dtype=jnp.float32)
        tb.target_batch_size = 1 << 12
        tb.rays_per_batch = 256
        tb.n_march = 96
        tb.max_samples_per_ray = 32
        tb.density_samples_override = 1 << 14
        tb.adapt_ray_batch = False
        tb.optimize_extrinsics = True
        tb.optimize_exposure = True
        tb.n_steps_between_cam_updates = 4
        tb.steps_per_dispatch = k
        return tb

    tb1 = mk(1)
    tb1.train(10)
    tb2 = mk(4)
    tb2.train(10)
    assert tb2.training_step == 10
    assert np.abs(tb2.cam_pos_offset).max() > 0
    np.testing.assert_allclose(tb2.cam_pos_offset, tb1.cam_pos_offset,
                               rtol=1e-4, atol=1e-7)
    np.testing.assert_allclose(tb2.cam_rot_offset, tb1.cam_rot_offset,
                               rtol=1e-4, atol=1e-7)
    np.testing.assert_allclose(np.asarray(tb2.data.exposures),
                               np.asarray(tb1.data.exposures),
                               rtol=1e-4, atol=1e-7)
    np.testing.assert_allclose(
        np.asarray(tb2.state["params"]["pos_encoding"]),
        np.asarray(tb1.state["params"]["pos_encoding"]),
        rtol=1e-4, atol=1e-6)


def test_error_map_importance_sampling_builds_cdfs():
    tb = NerfTestbed(make_dataset(), CFG, compute_dtype=jnp.float32)
    tb.target_batch_size = 1 << 12
    tb.rays_per_batch = 256
    tb.n_march = 96
    tb.max_samples_per_ray = 32
    tb.density_samples_override = 1 << 14
    tb.n_steps_between_error_map_updates = 8
    tb.train(10)
    assert tb._error_cdfs is not None
    cdf_img = np.asarray(tb._error_cdfs["cdf_img"])
    assert abs(cdf_img[-1] - 1.0) < 1e-5
    assert (np.diff(cdf_img) >= 0).all()
    tb.train(3)  # training continues with importance sampling on
    assert np.isfinite(tb.loss_scalar)


def test_envmap_and_distortion_training():
    tb = NerfTestbed(make_dataset(), CFG, compute_dtype=jnp.float32)
    tb.target_batch_size = 1 << 12
    tb.rays_per_batch = 256
    tb.n_march = 96
    tb.max_samples_per_ray = 32
    tb.density_samples_override = 1 << 14
    tb.train_envmap = True
    tb.optimize_distortion = True
    env0 = np.asarray(tb.envmap.params).copy()
    dist0 = np.asarray(tb.distortion_map.params).copy()
    tb.train(6)
    assert np.isfinite(tb.loss_scalar)
    assert np.abs(np.asarray(tb.envmap.params) - env0).max() > 0
    # distortion gradients exist (may be small on a pinhole scene)
    assert np.isfinite(np.asarray(tb.distortion_map.params)).all()


def test_mesh_extraction_and_refinement(testbed):
    verts, faces, colors = testbed.compute_marching_cubes_mesh(
        resolution=32, thresh=1.0)
    if len(verts) == 0:
        import pytest
        pytest.skip("no surface at this threshold on the tiny scene")
    assert colors.shape == (len(verts), 3)
    refined = testbed.optimise_mesh_step(verts, faces, n_steps=2,
                                         thresh=1.0)
    assert refined.shape == verts.shape
    assert np.isfinite(refined).all()
    # refinement moves vertices but not far
    delta = np.linalg.norm(refined - verts, axis=-1)
    assert delta.max() < 0.1


def test_density_slice_render(testbed):
    img = testbed.render_density_slice(resolution=32)
    assert img.shape == (32, 32, 3)
    assert np.isfinite(img).all()


def test_additional_render_modes(testbed):
    for mode in ("AO", "EncodingVis", "Cost", "Positions", "Distortion"):
        img = testbed.render_frame(16, 16,
                                   np.asarray(testbed.data.xforms_start[0]),
                                   render_mode=mode, tile=256)
        assert img.shape == (16, 16, 4)
        assert np.isfinite(img).all()


def test_distortion_mode_visualizes_lens():
    """A distorting lens must produce nonzero flow; pinhole must be black."""
    from instant_ngp_tpu.camera import lens_mode_id
    from instant_ngp_tpu.nerf.render import distortion_flow_image

    cam = np.eye(3, 4, dtype=np.float32)
    fl = np.array([40.0, 40.0], np.float32)
    pin = np.asarray(distortion_flow_image(16, 16, fl, cam))
    assert pin[..., :3].max() < 1e-4
    params = np.array([0.2, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0], np.float32)
    warped = np.asarray(distortion_flow_image(
        16, 16, fl, cam, lens_mode=lens_mode_id("OpenCV"),
        lens_params=params))
    assert warped[..., :3].max() > 0.01


def test_mixed_resolution_dataset_trains_and_evals():
    """Mixed-res datasets pack pad-to-max with per-image true
    resolutions (the reference's loader is fully per-image; our round-1
    limitation removed). Training and eval must work end to end."""
    ds = make_dataset(n_cams=4, size=32)
    # resize two cameras' images to a different resolution (48x24):
    # nearest-neighbor stretch keeps content but changes (w, h)
    for i in (1, 3):
        img = ds.images[i]
        yy = (np.arange(24) * img.shape[0] // 24)
        xx = (np.arange(48) * img.shape[1] // 48)
        ds.images[i] = img[yy][:, xx]
        m = ds.metadata[i]
        ds.metadata[i] = FrameMetadata(
            (48, 24), np.array([60.0, 30.0], np.float32),
            m.principal_point, m.rolling_shutter, m.lens)

    tb = NerfTestbed(ds, CFG, compute_dtype=jnp.float32)
    tb.target_batch_size = 1 << 12
    tb.rays_per_batch = 256
    tb.n_march = 96
    tb.max_samples_per_ray = 32
    tb.density_samples_override = 1 << 12
    assert tb.data.pixels.shape[1:3] == (32, 48)  # (Hmax, Wmax)
    np.testing.assert_array_equal(
        np.asarray(tb.data.resolutions),
        [[32, 32], [48, 24], [32, 32], [48, 24]])
    loss = tb.train(3)
    assert np.isfinite(loss)
    # per-view eval renders at each image's true resolution
    img = tb.render_training_view(1, spp=1)
    assert img.shape == (24, 48, 4)
    p = tb.eval_psnr(1)
    assert np.isfinite(p)
