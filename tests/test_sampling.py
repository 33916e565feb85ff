"""QMC sampling tests (ops/sampling.py vs reference random_val.cuh math)."""

import jax
import jax.numpy as jnp
import numpy as np

from instant_ngp_tpu.ops import sampling


def test_halton_matches_radical_inverse():
    # radical inverse base 2 of 1,2,3,4 = 0.5, 0.25, 0.75, 0.125
    out = np.asarray(sampling.halton(jnp.arange(5), 2))
    np.testing.assert_allclose(out, [0.0, 0.5, 0.25, 0.75, 0.125], atol=1e-6)
    out3 = np.asarray(sampling.halton(jnp.arange(4), 3))
    np.testing.assert_allclose(out3, [0.0, 1 / 3, 2 / 3, 1 / 9], atol=1e-6)


def test_halton23_shape_and_range():
    pts = np.asarray(sampling.halton23(jnp.arange(1000)))
    assert pts.shape == (1000, 2)
    assert (pts >= 0).all() and (pts < 1).all()
    # low discrepancy: each quadrant gets ~25%
    quad = (pts[:, 0] > 0.5).astype(int) * 2 + (pts[:, 1] > 0.5).astype(int)
    counts = np.bincount(quad, minlength=4)
    assert (np.abs(counts - 250) < 30).all()


def test_sobol_first_points():
    # Unscrambled Sobol dim 0 is van der Corput base 2.
    x = np.asarray(sampling.sobol(jnp.arange(8), 0)).astype(np.uint64)
    np.testing.assert_array_equal(
        (x / 2**32), [0.0, 0.5, 0.25, 0.75, 0.125, 0.625, 0.375, 0.875])


def test_ld_samples_stratification():
    # Owen-scrambled Sobol keeps (0,2)-sequence stratification: the first
    # 4^k points land one per cell of any 2^k x 2^k grid.
    pts = np.asarray(sampling.ld_samples(jnp.arange(256), seed=7, n_dims=2))
    cells = (pts * 16).astype(int)
    assert len({(a, b) for a, b in cells}) == 256


def test_stratify2():
    n = 1 << 8  # 256 = square pot
    base = jnp.full((n, 2), 0.5)
    out = np.asarray(sampling.stratify2(base, 8))
    # every sample falls in its own cell of the 16x16 grid
    cells = (out * 16).astype(int)
    assert len({(a, b) for a, b in cells}) == n
    assert (out >= 0).all() and (out < 1).all()


def test_generate_modes():
    for mode in ["Random", "Halton", "Sobol", "Stratified"]:
        pts = np.asarray(sampling.generate_2d_samples(mode, 256, step=3, seed=5))
        assert pts.shape == (256, 2)
        assert (pts >= 0).all() and (pts <= 1).all()


def test_qmc_sequences_advance_with_step():
    a = np.asarray(sampling.generate_2d_samples("Halton", 64, step=0, seed=5))
    b = np.asarray(sampling.generate_2d_samples("Halton", 64, step=1, seed=5))
    assert not np.allclose(a, b)


def test_ld_pixel_offset():
    off0 = np.asarray(sampling.ld_pixel_offset(0))
    np.testing.assert_allclose(off0, [0.5, 0.5], atol=1e-6)
    off1 = np.asarray(sampling.ld_pixel_offset(1))
    assert not np.allclose(off1, off0)
