"""Image-mode end-to-end tests (SURVEY.md §7 step 1: the minimum slice)."""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from instant_ngp_tpu.config import load_network_config
from instant_ngp_tpu.data.images import read_image
from instant_ngp_tpu.image import ImageTestbed

SMALL_CFG = {
    "loss": {"otype": "L2"},
    "optimizer": {"otype": "ExponentialDecay", "decay_start": 20000,
                  "decay_interval": 10000, "decay_base": 0.33, "nested": {
                      "otype": "Adam", "learning_rate": 1e-2, "beta1": 0.9,
                      "beta2": 0.99, "epsilon": 1e-15, "l2_reg": 1e-6}},
    "encoding": {"otype": "HashGrid", "n_levels": 8,
                 "n_features_per_level": 2, "log2_hashmap_size": 14,
                 "base_resolution": 8},
    "network": {"otype": "FullyFusedMLP", "activation": "ReLU",
                "output_activation": "None", "n_neurons": 32,
                "n_hidden_layers": 2},
}


def synthetic_image(h=64, w=64):
    y, x = np.mgrid[0:h, 0:w].astype(np.float32)
    r = 0.5 + 0.5 * np.sin(x / 7.0)
    g = 0.5 + 0.5 * np.cos(y / 5.0)
    b = ((x // 16 + y // 16) % 2).astype(np.float32)
    return np.stack([r, g, b], axis=-1) * 0.8 + 0.1


def test_image_training_psnr_increases():
    tb = ImageTestbed(synthetic_image(), SMALL_CFG,
                      compute_dtype=jnp.float32)
    p0 = tb.psnr()
    tb.train(150, batch_size=1 << 12)
    p1 = tb.psnr()
    assert p1 > p0 + 5, f"PSNR {p0} -> {p1}"
    assert p1 > 20


def test_image_variance_schedule_switches_to_exact():
    """stochastic_corners_until: one train() call crossing the boundary
    splits into a stochastic chunk and an exact chunk; the step counter
    advances correctly and training stays finite."""
    tb = ImageTestbed(synthetic_image(), SMALL_CFG,
                      compute_dtype=jnp.float32)
    tb.stochastic_corners_until = 20
    assert tb._stoch_now()
    loss = tb.train(50, batch_size=1 << 10)
    assert tb.training_step == 50
    assert not tb._stoch_now()
    assert np.isfinite(loss)
    # boundary respected also from the scanned dispatch path
    tb2 = ImageTestbed(synthetic_image(), SMALL_CFG,
                       compute_dtype=jnp.float32)
    tb2.stochastic_corners_until = 20
    tb2.steps_per_dispatch = 8
    tb2.train(50, batch_size=1 << 10)
    assert tb2.training_step == 50
    assert not tb2._stoch_now()


def test_image_scanned_dispatch_matches_eager():
    import jax

    img = synthetic_image(32, 32)
    tb1 = ImageTestbed(img, SMALL_CFG, compute_dtype=jnp.float32)
    tb1.train(8, batch_size=512)
    tb2 = ImageTestbed(img, SMALL_CFG, compute_dtype=jnp.float32)
    tb2.steps_per_dispatch = 4
    tb2.train(8, batch_size=512)
    l1 = jax.tree_util.tree_leaves(tb1.state["params"])
    l2 = jax.tree_util.tree_leaves(tb2.state["params"])
    for a, b in zip(l1, l2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_image_random_modes_all_train():
    for mode in ["Random", "Halton", "Sobol", "Stratified"]:
        tb = ImageTestbed(synthetic_image(32, 32), SMALL_CFG,
                          compute_dtype=jnp.float32)
        tb.random_mode = mode
        loss = tb.train(20, batch_size=1 << 10)
        assert np.isfinite(loss)


def test_image_render_shape_and_alpha():
    tb = ImageTestbed(synthetic_image(), SMALL_CFG, compute_dtype=jnp.float32)
    img = tb.render(32, 24)
    assert img.shape == (24, 32, 4)
    np.testing.assert_allclose(img[..., 3], 1.0)


def test_image_snapshot_roundtrip(tmp_path):
    tb = ImageTestbed(synthetic_image(), SMALL_CFG, compute_dtype=jnp.float32)
    tb.train(30, batch_size=1 << 10)
    path = os.path.join(tmp_path, "image.ingp")
    tb.save_snapshot(path)

    from instant_ngp_tpu.data.snapshot import load_snapshot

    tb2 = ImageTestbed(synthetic_image(), SMALL_CFG, compute_dtype=jnp.float32)
    tb2.load_snapshot_state(load_snapshot(path))
    assert abs(tb.compute_mse() - tb2.compute_mse()) < 1e-7


def test_image_albert_exr(reference_data):
    """The BASELINE config-#1 smoke test: fit albert.exr downscaled."""
    path = os.path.join(reference_data, "image", "albert.exr")
    if not os.path.isfile(path):
        pytest.skip("albert.exr unavailable")
    img = read_image(path)[::8, ::8]
    cfg = load_network_config(
        os.path.join(os.path.dirname(__file__), "..", "configs",
                     "image", "base.json"))
    cfg["encoding"]["log2_hashmap_size"] = 15
    tb = ImageTestbed(img, cfg, compute_dtype=jnp.float32)
    tb.train(100, batch_size=1 << 12)
    assert tb.psnr() > 20
