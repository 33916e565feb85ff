import jax
import jax.numpy as jnp
import numpy as np
import pytest

from instant_ngp_tpu.ops.encodings import (
    CompositeEncoding, FrequencyEncoding, IdentityEncoding, OneBlobEncoding,
    SphericalHarmonicsEncoding, TriangleWaveEncoding, create_encoding)


def test_identity():
    enc = create_encoding(3, {"otype": "Identity", "scale": 2.0, "offset": 0.5})
    x = jnp.array([[0.1, 0.2, 0.3]])
    np.testing.assert_allclose(enc.apply(None, x), x * 2.0 + 0.5)


def test_frequency_shapes_and_values():
    enc = FrequencyEncoding(n_dims=2, n_frequencies=3)
    assert enc.n_output_dims == 12
    x = jnp.array([[0.25, 0.5]])
    out = np.asarray(enc.apply(None, x))
    # dim 0, freq 0: sin/cos(0.25*pi)
    np.testing.assert_allclose(out[0, 0], np.sin(0.25 * np.pi), rtol=1e-6)
    np.testing.assert_allclose(out[0, 1], np.cos(0.25 * np.pi), rtol=1e-6)
    # dim 0, freq 1: sin/cos(0.5*pi)
    np.testing.assert_allclose(out[0, 2], 1.0, rtol=1e-6)


def test_sh_orthonormality():
    """Monte-Carlo check that the degree-4 basis is orthonormal over S2."""
    enc = SphericalHarmonicsEncoding(degree=4)
    assert enc.n_output_dims == 16
    rng = np.random.default_rng(0)
    d = rng.normal(size=(200000, 3))
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    basis = np.asarray(enc.apply(None, jnp.asarray(d) * 0.5 + 0.5))
    gram = 4.0 * np.pi * basis.T @ basis / d.shape[0]
    np.testing.assert_allclose(gram, np.eye(16), atol=0.05)


def test_sh_degree_output_dims():
    for deg in (1, 2, 3, 4, 5):
        enc = SphericalHarmonicsEncoding(degree=deg)
        out = enc.apply(None, jnp.full((4, 3), 0.7))
        assert out.shape == (4, deg * deg)


def test_oneblob_mass_conservation():
    """Away from the boundary, bin masses of the kernel sum to ~1."""
    enc = OneBlobEncoding(n_dims=1, n_bins=16)
    x = jnp.linspace(0.2, 0.8, 50)[:, None]
    out = enc.apply(None, x)
    np.testing.assert_allclose(np.asarray(out.sum(-1)), 1.0, atol=1e-5)
    # peak bin is the one containing x
    peaks = np.asarray(out).argmax(-1)
    np.testing.assert_array_equal(peaks, np.floor(np.asarray(x[:, 0]) * 16).astype(int))


def test_trianglewave_range():
    enc = TriangleWaveEncoding(n_dims=1, n_frequencies=4)
    x = jnp.linspace(0, 1, 100)[:, None]
    out = np.asarray(enc.apply(None, x))
    assert out.shape == (100, 4)
    assert out.min() >= -1.0 - 1e-6 and out.max() <= 1.0 + 1e-6


def test_composite_nerf_dir_encoding():
    """configs/nerf/base.json dir_encoding: SH(3 dims, degree 4) + Identity."""
    cfg = {"otype": "Composite", "nested": [
        {"n_dims_to_encode": 3, "otype": "SphericalHarmonics", "degree": 4},
        {"otype": "Identity"},
    ]}
    enc = create_encoding(5, cfg)
    assert enc.n_output_dims == 16 + 2
    x = jnp.concatenate([jnp.full((4, 3), 0.5), jnp.full((4, 2), 0.25)], -1)
    out = enc.apply(enc.init(jax.random.PRNGKey(0)), x)
    assert out.shape == (4, 18)
    np.testing.assert_allclose(out[:, 16:], 0.25, rtol=1e-6)
