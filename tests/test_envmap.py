"""Dataset-provided envmap loading (nerf_loader.cu:531-543) and its
wiring into the trainable envmap + render background compositing
(testbed.cu:3850-3865, render_nerf testbed_nerf.cu:1862-1866)."""

import json
import os

import jax.numpy as jnp
import numpy as np
import pytest


@pytest.fixture
def envmap_scene(tmp_path):
    from PIL import Image

    # one 8x8 training frame
    frame = np.zeros((8, 8, 4), np.uint8)
    frame[2:6, 2:6] = [180, 90, 40, 255]
    Image.fromarray(frame, "RGBA").save(tmp_path / "f0.png")

    # 4x8 lat-long envmap, constant mid-grey with full alpha
    env = np.full((4, 8, 4), 128, np.uint8)
    env[..., 3] = 255
    Image.fromarray(env, "RGBA").save(tmp_path / "sky.png")

    xform = [[1.0, 0.0, 0.0, 0.5],
             [0.0, -1.0, 0.0, 0.5],
             [0.0, 0.0, -1.0, 2.0]]
    transforms = {
        "aabb_scale": 1,
        "envmap": "sky.png",
        "w": 8, "h": 8,
        "fl_x": 10.0, "fl_y": 10.0, "cx": 4.0, "cy": 4.0,
        "frames": [{"file_path": "f0.png",
                    "transform_matrix": xform + [[0, 0, 0, 1]]}],
    }
    with open(tmp_path / "transforms.json", "w") as f:
        json.dump(transforms, f)
    return tmp_path


def test_loader_populates_envmap(envmap_scene):
    from instant_ngp_tpu.common import srgb_to_linear
    from instant_ngp_tpu.data.nerf_loader import load_nerf

    ds = load_nerf(str(envmap_scene / "transforms.json"))
    assert ds.envmap is not None
    assert ds.envmap.shape == (4, 8, 4)
    # LDR envmaps are linearized on load
    np.testing.assert_allclose(ds.envmap[..., :3],
                               srgb_to_linear(128.0 / 255.0), atol=1e-5)
    np.testing.assert_allclose(ds.envmap[..., 3], 1.0)
    assert not ds.is_hdr


def test_loader_missing_envmap_raises(envmap_scene):
    from instant_ngp_tpu.data.nerf_loader import load_nerf

    with open(envmap_scene / "transforms.json") as f:
        t = json.load(f)
    t["envmap"] = "missing.exr"
    with open(envmap_scene / "transforms.json", "w") as f:
        json.dump(t, f)
    with pytest.raises(FileNotFoundError):
        load_nerf(str(envmap_scene / "transforms.json"))


def test_envmap_seeds_trainable_buffer_and_background(envmap_scene):
    from instant_ngp_tpu.data.nerf_loader import load_nerf
    from instant_ngp_tpu.nerf.testbed_nerf import NerfTestbed

    cfg = {
        "loss": {"otype": "Huber"},
        "optimizer": {"otype": "Adam", "learning_rate": 1e-2,
                      "beta1": 0.9, "beta2": 0.99, "epsilon": 1e-15},
        "encoding": {"otype": "HashGrid", "n_levels": 2,
                     "n_features_per_level": 2, "log2_hashmap_size": 8,
                     "base_resolution": 4},
        "network": {"n_neurons": 16, "n_hidden_layers": 1},
        "dir_encoding": {"otype": "SphericalHarmonics", "degree": 2},
        "rgb_network": {"n_neurons": 16, "n_hidden_layers": 1},
    }
    ds = load_nerf(str(envmap_scene / "transforms.json"))
    tb = NerfTestbed(ds, cfg, compute_dtype=jnp.float32)
    assert tb.has_dataset_envmap
    assert tb.envmap.params.shape == (4, 8, 4)
    np.testing.assert_allclose(np.asarray(tb.envmap.params),
                               ds.envmap, atol=1e-6)

    # untrained model ~= empty scene: rays pass through, so the frame
    # background defaults to the dataset envmap (not the black bg)
    cam = np.array([[1, 0, 0, 0.5], [0, -1, 0, 0.5], [0, 0, -1, 2.0]],
                   np.float32)
    img = tb.render_frame(4, 4, cam, focal_length=5.0)
    env_rgb = float(ds.envmap[0, 0, 0])
    assert np.isfinite(img).all()
    np.testing.assert_allclose(img[..., :3], env_rgb, atol=0.05)
