"""Unit tests for nerf/march.py vs reference semantics (nerf_device.cuh)."""

import jax.numpy as jnp
import numpy as np

from instant_ngp_tpu.common import (MAX_CONE_STEPSIZE, MIN_CONE_STEPSIZE,
                                    NERF_GRID_N_CELLS, NERF_GRIDSIZE)
from instant_ngp_tpu.nerf import march


def test_morton_roundtrip():
    idx = jnp.arange(NERF_GRID_N_CELLS, step=977)
    x, y, z = march.morton3d_coords(idx)
    back = march.morton3d(x, y, z)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(idx))
    # spot check: morton(1,0,0)=1, morton(0,1,0)=2, morton(0,0,1)=4
    assert int(march.morton3d(jnp.array([1]), jnp.array([0]),
                              jnp.array([0]))[0]) == 1
    assert int(march.morton3d(jnp.array([0]), jnp.array([1]),
                              jnp.array([0]))[0]) == 2
    assert int(march.morton3d(jnp.array([0]), jnp.array([0]),
                              jnp.array([1]))[0]) == 4


def test_warp_roundtrips():
    aabb_min = jnp.array([-2.0, -2.0, -2.0])
    aabb_max = jnp.array([3.0, 3.0, 3.0])
    pos = jnp.array([[0.0, 1.0, -1.5], [2.9, -2.0, 0.5]])
    w = march.warp_position(pos, aabb_min, aabb_max)
    assert (np.asarray(w) >= 0).all() and (np.asarray(w) <= 1).all()
    np.testing.assert_allclose(
        np.asarray(march.unwarp_position(w, aabb_min, aabb_max)),
        np.asarray(pos), atol=1e-5)

    d = jnp.array([[0.3, -0.9, 0.1]])
    np.testing.assert_allclose(
        np.asarray(march.unwarp_direction(march.warp_direction(d))),
        np.asarray(d), atol=1e-6)

    dt = jnp.array([MIN_CONE_STEPSIZE, MAX_CONE_STEPSIZE, 0.01])
    np.testing.assert_allclose(
        np.asarray(march.unwarp_dt(march.warp_dt(dt))), np.asarray(dt),
        rtol=1e-5)


def test_stepping_space_roundtrip():
    for cone in (0.0, 1.0 / 256.0):
        t = jnp.array([0.01, 0.1, 1.0, 10.0, 100.0])
        n = march.to_stepping_space(t, cone)
        back = march.from_stepping_space(n, cone)
        np.testing.assert_allclose(np.asarray(back), np.asarray(t),
                                   rtol=1e-4)


def test_calc_dt_clamps():
    # uniform stepping: dt == MIN everywhere
    dt0 = march.calc_dt(jnp.array([0.5]), 0.0)
    np.testing.assert_allclose(float(dt0[0]), MIN_CONE_STEPSIZE, rtol=1e-5)
    # exponential stepping: dt grows with t but clamps to [MIN, MAX]
    cone = 1.0 / 256.0
    dts = np.asarray(march.calc_dt(jnp.array([1e-4, 0.5, 5.0, 500.0]), cone))
    assert dts[0] >= MIN_CONE_STEPSIZE * 0.99
    assert dts[1] > dts[0]
    assert dts[-1] <= MAX_CONE_STEPSIZE * 1.01
    # mid-range matches t * log1p(cone) ~= t * cone
    assert abs(dts[2] - 5.0 * np.log1p(cone)) / dts[2] < 0.05


def test_mip_from_pos():
    pos = jnp.array([[0.5, 0.5, 0.5],    # exact center: frexp(0)=(0,0) -> 1
                     [0.9, 0.5, 0.5],    # |p-.5|=0.4 < 0.5 -> mip 0
                     [1.4, 0.5, 0.5],    # 0.9 -> mip 1
                     [2.4, 0.5, 0.5],    # 1.9 -> mip 2
                     [60.0, 0.5, 0.5]])  # huge -> clamp to max
    mips = np.asarray(march.mip_from_pos(pos, 7))
    np.testing.assert_array_equal(mips, [1, 0, 1, 2, 7])


def test_occupancy_bit_addressing():
    from instant_ngp_tpu.nerf import occupancy

    grid = occupancy.init_density_grid(1)
    # occupy the cell containing (0.5, 0.5, 0.5): coords (64, 64, 64)
    idx = int(march.morton3d(jnp.array([64]), jnp.array([64]),
                             jnp.array([64]))[0])
    grid = grid.at[idx].set(1.0)
    bitfield = occupancy.update_bitfield(grid, max_cascade=0)
    pos = jnp.array([[0.504, 0.504, 0.504], [0.3, 0.3, 0.3]])
    occ = np.asarray(march.density_grid_occupied_at(
        pos, bitfield, jnp.zeros(2, jnp.int32)))
    assert occ[0] and not occ[1]
    # mip 1 max-pool: same world position must be occupied at mip 1
    occ1 = np.asarray(march.density_grid_occupied_at(
        pos, bitfield, jnp.ones(2, jnp.int32)))
    assert occ1[0]


def test_ray_aabb():
    o = jnp.array([[0.5, 0.5, -1.0], [2.0, 2.0, 2.0]])
    d = jnp.array([[0.0, 0.0, 1.0], [1.0, 0.0, 0.0]])
    tmin, tmax = march.ray_intersect_aabb(o, d, jnp.zeros(3), jnp.ones(3))
    assert abs(float(tmin[0]) - 1.0) < 1e-5
    assert abs(float(tmax[0]) - 2.0) < 1e-5
    assert float(tmin[1]) > float(tmax[1])  # miss


def test_advance_to_next_voxel_moves_past_border():
    pos = jnp.array([[0.501, 0.5, 0.5]])
    d = jnp.array([[1.0, 0.0, 0.0]])
    idir = 1.0 / jnp.where(jnp.abs(d) < 1e-12, 1e-12, d)
    t = jnp.array([0.0])
    t_next = march.advance_to_next_voxel(t, 0.0, pos, d, idir,
                                         jnp.array([0]))
    # next voxel border along +x from x=0.501 at res 128 is x=0.5078125
    assert float(t_next[0]) >= (0.5078125 - 0.501) - 1e-4
    assert float(t_next[0]) < 0.02
