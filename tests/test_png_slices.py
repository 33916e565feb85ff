"""Density/SDF slice-atlas PNG export (compute_and_save_png_slices,
reference testbed.cu:534-558 + save_density_grid_to_png,
marching_cubes.cu:957-1034, bound to Python in python_api.cu:451)."""

import os

import jax.numpy as jnp
import numpy as np

from instant_ngp_tpu.geom.marching import (density_slice_atlas,
                                           marching_cubes_res)


def test_marching_cubes_res_proportional():
    # extents (1, 0.5, 0.25) at res 256 -> (256, 128, 64), all already
    # multiples of 16
    assert marching_cubes_res(256, (0, 0, 0), (1.0, 0.5, 0.25)) \
        == (256, 128, 64)
    # rounding up to the next multiple of 16
    assert marching_cubes_res(100, (0, 0, 0), (1.0, 1.0, 1.0)) \
        == (112, 112, 112)
    # tiny extents never collapse to zero
    assert min(marching_cubes_res(64, (0, 0, 0), (1.0, 1e-6, 1.0))) >= 16


def test_atlas_layout_and_mapping():
    X, Y, Z = 2, 3, 4
    thresh, rng = 2.5, 4.0
    field = np.full((X, Y, Z), thresh, np.float32)
    field[1, 0, 2] = thresh + rng          # -> 255 (saturates high)
    field[0, 2, 3] = thresh - rng          # -> 0 (saturates low)

    atlas = density_slice_atlas(field, thresh, rng)
    # 4 slices -> floor(sqrt(4)) = 2 rows x 2 across
    assert atlas.shape == (Y * 2, X * 2) and atlas.dtype == np.uint8
    # at-threshold voxels map to 128 (mid-gray)
    assert atlas[0, 0] == 128
    # slice z sits at tile (row z // 2, col z % 2); vertical axis is y,
    # flipped so +y is up: pixel row within tile = Y - 1 - y
    z, x, y = 2, 1, 0
    v = (z // 2) * Y + (Y - 1 - y)
    u = (z % 2) * X + x
    assert atlas[v, u] == 255
    z, x, y = 3, 0, 2
    v = (z // 2) * Y + (Y - 1 - y)
    u = (z % 2) * X + x
    assert atlas[v, u] == 0


def test_atlas_flip_y_and_z():
    X, Y, Z = 2, 4, 3
    field = np.zeros((X, Y, Z), np.float32)
    field[1, 3, 2] = 4.0
    atlas = density_slice_atlas(field, 0.0, 4.0, flip_y_and_z=True)
    # slices along y (4 of them -> 2x2 tiles), vertical axis z, unflipped
    assert atlas.shape == (Z * 2, X * 2)
    y, x, z = 3, 1, 2
    v = (y // 2) * Z + z
    u = (y % 2) * X + x
    assert atlas[v, u] == 255


def test_atlas_pads_partial_rows_black():
    field = np.full((2, 2, 5), 10.0, np.float32)   # 5 slices -> 2x3 grid
    atlas = density_slice_atlas(field, 0.0, 4.0)
    assert atlas.shape == (4, 6)
    assert (atlas[:, :5 * 2 // 2] != 0).any()
    # 6th (padding) tile is black
    assert (atlas[2:, 4:] == 0).all()


def test_nerf_png_slices_roundtrip(tmp_path):
    from PIL import Image

    from tests.test_nerf_training import CFG, make_dataset
    from instant_ngp_tpu.nerf.testbed_nerf import NerfTestbed

    tb = NerfTestbed(make_dataset(), CFG, compute_dtype=jnp.float32)
    tb.target_batch_size = 1 << 10
    tb.train(2)
    base = str(tmp_path / "snap")
    res3d = tb.compute_and_save_png_slices(base, resolution=16)
    assert res3d == (16, 16, 16)
    out = f"{base}.density_slices_16x16x16.png"
    assert os.path.isfile(out)
    img = Image.open(out)
    assert img.size == (16 * 4, 16 * 4)    # 16 slices -> 4x4 tiles


def test_sdf_png_slices_ground_truth(tmp_path):
    from PIL import Image

    from instant_ngp_tpu.sdf import SdfTestbed
    from tests.test_geom_modes import SMALL_NET, make_box_mesh

    tb = SdfTestbed(make_box_mesh(0.0, 1.0), SMALL_NET,
                    compute_dtype=jnp.float32)
    base = str(tmp_path / "sdf")
    res3d = tb.compute_and_save_png_slices(base, resolution=16,
                                           ground_truth=True)
    out = (f"{base}.density_slices_"
           f"{res3d[0]}x{res3d[1]}x{res3d[2]}.png")
    assert os.path.isfile(out)
    img = np.asarray(Image.open(out))
    # negated voxel-unit range: inside the box renders light (> 128),
    # outside dark; the mid slice must contain both
    assert img.max() > 128 and img.min() < 128


def test_testbed_facade_exposes_png_slices():
    from instant_ngp_tpu.testbed import Testbed

    assert callable(getattr(Testbed, "compute_and_save_png_slices"))
