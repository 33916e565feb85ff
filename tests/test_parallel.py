"""Sharded NeRF training tests on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from instant_ngp_tpu.parallel import data_parallel_mesh, replicate


def test_sharded_nerf_step_matches_grad_semantics():
    if len(jax.devices()) < 2:
        pytest.skip("needs multiple devices")
    import sys, os
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from __graft_entry__ import dryrun_multichip

    dryrun_multichip(len(jax.devices()))


def test_sharded_image_training_loss_decreases():
    if len(jax.devices()) < 2:
        pytest.skip("needs multiple devices")
    from jax.sharding import NamedSharding, PartitionSpec as P

    from instant_ngp_tpu.ops.factory import create_network_with_encoding
    from instant_ngp_tpu.ops.losses import create_loss
    from instant_ngp_tpu.ops.optimizers import create_optimizer
    from instant_ngp_tpu.ops.trainer import Trainer
    from instant_ngp_tpu.parallel import shard_batch

    cfg = {
        "loss": {"otype": "L2"},
        "optimizer": {"otype": "ExponentialDecay", "decay_start": 100,
                      "decay_interval": 50, "decay_base": 0.33, "nested": {
                          "otype": "Adam", "learning_rate": 1e-2,
                          "beta1": 0.9, "beta2": 0.99, "epsilon": 1e-15}},
        "encoding": {"otype": "HashGrid", "n_levels": 4,
                     "n_features_per_level": 2, "log2_hashmap_size": 10,
                     "base_resolution": 4},
        "network": {"n_neurons": 16, "n_hidden_layers": 1},
    }
    mesh = data_parallel_mesh()
    model, _ = create_network_with_encoding(2, 3, cfg, 64.0,
                                            compute_dtype=jnp.float32)
    trainer = Trainer(model, create_optimizer(cfg["optimizer"]),
                      create_loss(cfg["loss"]))
    state = replicate(mesh, trainer.init_state())
    x = shard_batch(mesh, jax.random.uniform(jax.random.PRNGKey(0),
                                             (1024, 2)))
    y = shard_batch(mesh, jnp.stack([x[:, 0], x[:, 1],
                                     x[:, 0] * x[:, 1]], -1))
    step = jax.jit(trainer.train_step,
                   out_shardings=(NamedSharding(mesh, P()),
                                  NamedSharding(mesh, P())))
    losses = []
    for _ in range(30):
        state, loss = step(state, x, y)
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.3
