"""Interpret-mode parity tests for the Pallas TPU kernels
(SURVEY.md §4: kernel-level parity vs the pure-jnp reference)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from instant_ngp_tpu.ops.grid_encoding import GridEncoding
from instant_ngp_tpu.ops.mlp import MLP
from instant_ngp_tpu.ops.pallas.grid_kernels import (grid_encode_pallas,
                                                     supports)
from instant_ngp_tpu.ops.pallas.mlp_kernels import fused_mlp_forward


@pytest.mark.parametrize("gtype", ["Hash", "Dense", "Tiled"])
def test_grid_kernel_matches_reference(gtype):
    enc = GridEncoding(n_dims=3, n_levels=5, n_features_per_level=2,
                       log2_hashmap_size=11, base_resolution=4,
                       per_level_scale=1.7, grid_type=gtype)
    assert supports(enc)
    params = enc.init(jax.random.PRNGKey(0))
    x = jax.random.uniform(jax.random.PRNGKey(1), (300, 3))
    ref = np.asarray(enc.apply(params, x))
    out = np.asarray(grid_encode_pallas(enc, params, x, tile=128,
                                        interpret=True))
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-8)


def test_grid_kernel_2d():
    enc = GridEncoding(n_dims=2, n_levels=4, n_features_per_level=4,
                       log2_hashmap_size=10, base_resolution=8)
    params = enc.init(jax.random.PRNGKey(0))
    x = jax.random.uniform(jax.random.PRNGKey(1), (130, 2))
    ref = np.asarray(enc.apply(params, x))
    out = np.asarray(grid_encode_pallas(enc, params, x, tile=64,
                                        interpret=True))
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-8)


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
