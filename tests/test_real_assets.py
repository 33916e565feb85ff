"""Smoke tests against the real reference assets (skipped if absent)."""

import os

import numpy as np
import pytest

DATA = "/root/reference/data"

needs_data = pytest.mark.skipif(not os.path.isdir(DATA),
                                reason="reference data not mounted")


@needs_data
def test_load_fox_capture():
    from instant_ngp_tpu.data.nerf_loader import load_nerf

    ds = load_nerf(os.path.join(DATA, "nerf/fox/transforms.json"))
    assert len(ds.images) > 40
    assert ds.metadata[0].lens.mode == "OpenCV"
    assert ds.aabb_scale >= 4


@needs_data
def test_load_campfire_capture():
    from instant_ngp_tpu.data.nerf_loader import load_nerf

    path = os.path.join(DATA, "nerf/campfire/transforms.json")
    if not os.path.exists(path):
        pytest.skip("campfire not present")
    ds = load_nerf(path)
    assert len(ds.images) == 50
    assert ds.aabb_scale == 4


@needs_data
def test_load_transforms_train_style():
    from instant_ngp_tpu.data.nerf_loader import load_nerf

    path = os.path.join(DATA, "nerf/test/dataset/transforms_train.json")
    if not os.path.exists(path):
        pytest.skip("synthetic-style dataset not present")
    ds = load_nerf(path)
    assert len(ds.images) == 50


@needs_data
def test_real_geometry_scene_renders():
    from instant_ngp_tpu.geometry import GeometryTestbed

    path = os.path.join(DATA, "geometry/geometrypaths.json")
    if not os.path.exists(path):
        pytest.skip("geometry scene not present")
    tb = GeometryTestbed(path)
    assert len(tb.meshes) == 1
    cam = np.array([[1, 0, 0, 0.0], [0, -1, 0, 0.0], [0, 0, -1, 3.0]],
                   np.float32)
    img = tb.render_frame(32, 32, cam)
    assert np.isfinite(img).all()
    assert (img[..., 3] > 0.5).mean() > 0.1  # the cube is visible


@needs_data
def test_armadillo_bvh_build():
    from instant_ngp_tpu.geom.triangle_bvh import (TriangleBvh, load_obj,
                                                   normalize_mesh_to_unit_cube)

    tris = load_obj(os.path.join(DATA, "sdf/armadillo.obj"))
    assert len(tris) > 10000
    tris, _, _ = normalize_mesh_to_unit_cube(tris)
    bvh = TriangleBvh(tris)
    d = bvh.signed_distance(np.array([[0.5, 0.5, 0.5]], np.float32),
                            mode="Raystab")
    assert np.isfinite(d).all()


@needs_data
def test_geometry_snapshot_roundtrip(tmp_path):
    """Geometry snapshots are self-contained: the scene round-trips with
    no external files (exceeds the reference, which cannot snapshot the
    mode at all — training is disabled, testbed.cu:4026-4030)."""
    from instant_ngp_tpu.geometry import GeometryTestbed
    from instant_ngp_tpu.testbed import Testbed

    path = os.path.join(DATA, "geometry/geometrypaths.json")
    if not os.path.exists(path):
        pytest.skip("geometry scene not present")
    tb = GeometryTestbed(path)
    cam = np.array([[1, 0, 0, 0.0], [0, -1, 0, 0.0], [0, 0, -1, 3.0]],
                   np.float32)
    ref = tb.render_frame(24, 24, cam)

    snap_path = str(tmp_path / "scene.ingp")
    tb.save_snapshot(snap_path)

    # restore through the public facade with NO scene file
    tb2 = Testbed()
    tb2.load_snapshot(snap_path)
    assert len(tb2.impl.meshes) == len(tb.meshes)
    img = tb2.impl.render_frame(24, 24, cam)
    np.testing.assert_allclose(img, ref, atol=1e-5)
