"""TriangleOctree + Takikawa encoding tests."""

import jax
import jax.numpy as jnp
import numpy as np

from instant_ngp_tpu.geom.triangle_octree import TriangleOctree
from instant_ngp_tpu.ops.takikawa import TakikawaEncoding


def make_tri_at_center():
    # one triangle near the center of [0,1]^3
    return np.array([[[0.45, 0.5, 0.5], [0.55, 0.5, 0.5],
                      [0.5, 0.55, 0.52]]], np.float32)


def test_octree_contains():
    tree = TriangleOctree(make_tri_at_center(), depth=5)
    on = jnp.array([[0.5, 0.51, 0.51]])
    off = jnp.array([[0.05, 0.05, 0.05]])
    assert bool(tree.contains(on, 4)[0])
    assert not bool(tree.contains(off, 4)[0])
    # vertex count grows with depth and is consistent
    assert tree.n_vertices > 0
    for lvl in tree.levels:
        assert len(lvl.vertex_codes) >= len(lvl.cell_codes) and \
            (len(lvl.cell_codes) == 0 or len(lvl.vertex_codes) >= 8)


def test_takikawa_encoding_shapes_and_gradient():
    tree = TriangleOctree(make_tri_at_center(), depth=6)
    enc = TakikawaEncoding(tree, starting_level=3, n_features_per_level=4)
    params = enc.init(jax.random.PRNGKey(0))
    assert params.shape == (enc.n_params,)
    x = jnp.array([[0.5, 0.51, 0.51], [0.05, 0.05, 0.05]])
    out = enc.apply(params, x)
    assert out.shape == (2, enc.n_output_dims)
    # off-surface point encodes to zeros at every level
    np.testing.assert_allclose(np.asarray(out[1]), 0.0)
    # gradients flow to the feature table
    g = jax.grad(lambda p: jnp.sum(enc.apply(p, x) ** 2))(params)
    assert np.abs(np.asarray(g)).max() > 0


def test_takikawa_sum_mode():
    tree = TriangleOctree(make_tri_at_center(), depth=5)
    enc = TakikawaEncoding(tree, starting_level=2, n_features_per_level=2,
                           sum_instead_of_concat=True)
    params = enc.init(jax.random.PRNGKey(1))
    x = jnp.array([[0.5, 0.51, 0.51]])
    assert enc.apply(params, x).shape == (1, 2)
