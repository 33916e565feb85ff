"""Trainer + snapshot round-trip tests."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from instant_ngp_tpu.data.snapshot import (SNAPSHOT_FORMAT_VERSION,
                                           load_snapshot, save_snapshot)
from instant_ngp_tpu.ops.factory import create_network_with_encoding
from instant_ngp_tpu.ops.losses import create_loss
from instant_ngp_tpu.ops.optimizers import create_optimizer
from instant_ngp_tpu.ops.trainer import Trainer, default_l2_mask

CFG = {
    "loss": {"otype": "L2"},
    "optimizer": {"otype": "Ema", "decay": 0.95, "nested": {
        "otype": "ExponentialDecay", "decay_start": 100, "decay_interval": 50,
        "decay_base": 0.33, "nested": {
            "otype": "Adam", "learning_rate": 1e-2, "beta1": 0.9,
            "beta2": 0.99, "epsilon": 1e-15, "l2_reg": 1e-6}}},
    "encoding": {"otype": "HashGrid", "n_levels": 4, "n_features_per_level": 2,
                 "log2_hashmap_size": 10, "base_resolution": 4},
    "network": {"otype": "FullyFusedMLP", "activation": "ReLU",
                "output_activation": "None", "n_neurons": 16,
                "n_hidden_layers": 1},
}


def make_trainer():
    model, _ = create_network_with_encoding(2, 3, CFG,
                                            desired_resolution=64.0,
                                            compute_dtype=jnp.float32)
    return Trainer(model, create_optimizer(CFG["optimizer"]),
                   create_loss(CFG["loss"]), seed=3)


def test_training_reduces_loss():
    trainer = make_trainer()
    state = trainer.init_state()
    key = jax.random.PRNGKey(0)
    x = jax.random.uniform(key, (1024, 2))
    y = jnp.stack([x[:, 0], x[:, 1], x[:, 0] * x[:, 1]], axis=-1)
    first = None
    for _ in range(60):
        state, loss = trainer.training_step(state, x, y)
        if first is None:
            first = float(loss)
    assert float(loss) < first * 0.2


def test_l2_mask_excludes_encoding():
    trainer = make_trainer()
    params = trainer.init_state()["params"]
    mask = default_l2_mask(params)
    assert mask["encoding"] is False or not np.any(mask["encoding"])
    assert all(m for m in mask["net"])


def test_custom_gradient_step_matches_autodiff():
    trainer = make_trainer()
    state = trainer.init_state()
    x = jax.random.uniform(jax.random.PRNGKey(1), (256, 2))
    y = jnp.zeros((256, 3))

    # standard step
    s1, _ = trainer.train_step(state, x, y)

    # custom gradient: dL/dout of mean L2 = 2 (pred - y) / numel
    pred = trainer.model.apply(state["params"], x)
    dl_dout = 2.0 * (pred - y) / pred.size
    s2, _ = trainer.train_step_custom_gradient(
        state, x, dl_dout, jnp.asarray(0.0))

    flat1 = jax.tree_util.tree_leaves(s1["params"])
    flat2 = jax.tree_util.tree_leaves(s2["params"])
    for a, b in zip(flat1, flat2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-7)


def test_ema_inference_params_differ_from_raw():
    trainer = make_trainer()
    state = trainer.init_state()
    x = jax.random.uniform(jax.random.PRNGKey(2), (128, 2))
    y = jnp.ones((128, 3))
    state, _ = trainer.training_step(state, x, y)
    inf = trainer.inference_params(state)
    raw = state["params"]
    diffs = [float(np.abs(np.asarray(a) - np.asarray(b)).max())
             for a, b in zip(jax.tree_util.tree_leaves(inf),
                             jax.tree_util.tree_leaves(raw))]
    assert max(diffs) > 0  # EMA lags behind raw params


def test_snapshot_roundtrip(tmp_path):
    trainer = make_trainer()
    state = trainer.init_state()
    for ext in [".msgpack", ".ingp"]:
        path = os.path.join(tmp_path, "snap" + ext)
        save_snapshot(path, {"config": CFG, "trainer": state, "step": 42})
        snap = load_snapshot(path)
        assert snap["snapshot_format_version"] == SNAPSHOT_FORMAT_VERSION
        assert snap["step"] == 42
        assert snap["config"]["encoding"]["otype"] == "HashGrid"
        orig = jax.tree_util.tree_leaves(state)
        restored = jax.tree_util.tree_leaves(snap["trainer"])
        assert len(orig) == len(restored)
        for a, b in zip(orig, restored):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_snapshot_version_gate(tmp_path):
    path = os.path.join(tmp_path, "bad.msgpack")
    save_snapshot(path, {"x": 1})
    import msgpack

    with open(path, "rb") as f:
        payload = msgpack.unpackb(f.read(), raw=False)
    payload["snapshot_format_version"] = 999
    with open(path, "wb") as f:
        f.write(msgpack.packb(payload))
    with pytest.raises(ValueError, match="version"):
        load_snapshot(path)
