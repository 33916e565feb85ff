"""Interpret-mode parity tests for the Pallas TPU kernels
(SURVEY.md §4: kernel-level parity vs the pure-jnp reference).

The hash-grid Pallas kernels were removed in round 2: Mosaic cannot
express multi-vreg VMEM gathers on v5e and XLA's gather already runs at
the DMA-descriptor hardware rate (see ops/pallas/__init__.py). The fast
grid path is ops/grid_encoding.py's packed custom-VJP encode, tested in
test_grid_encoding.py."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from instant_ngp_tpu.ops.grid_encoding import GridEncoding
from instant_ngp_tpu.ops.mlp import MLP
from instant_ngp_tpu.ops.pallas.mlp_kernels import fused_mlp_forward


def test_fused_mlp_matches_reference():
    mlp = MLP(n_input_dims=32, n_output_dims=16, n_neurons=64,
              n_hidden_layers=2, compute_dtype=jnp.bfloat16)
    params = mlp.init(jax.random.PRNGKey(2))
    x = jax.random.normal(jax.random.PRNGKey(3), (200, 32))
    ref = np.asarray(mlp.apply(params, x))
    out = np.asarray(fused_mlp_forward(params, x, tile=128, interpret=True))
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)


def test_fused_mlp_output_activation():
    mlp = MLP(n_input_dims=8, n_output_dims=4, n_neurons=32,
              n_hidden_layers=1, output_activation="ReLU",
              compute_dtype=jnp.bfloat16)
    params = mlp.init(jax.random.PRNGKey(4))
    x = jax.random.normal(jax.random.PRNGKey(5), (64, 8))
    out = np.asarray(fused_mlp_forward(params, x, activation="ReLU",
                                       output_activation="ReLU",
                                       tile=64, interpret=True))
    assert (out >= 0).all()
    ref = np.asarray(mlp.apply(params, x))
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)
