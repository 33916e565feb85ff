"""NanoVDB FloatGrid reader/writer tests.

Round-trips sparse+dense grids through the .nvdb format, and (when the
reference's vendored NanoVDB header is present) cross-checks our byte
layout against the REAL nanovdb accessor compiled with g++."""

import os
import shutil
import struct
import subprocess

import numpy as np
import pytest

from instant_ngp_tpu.volume.nanovdb import (read_nanovdb_dense,
                                            write_nanovdb)

NANOVDB_INC = "/root/reference/dependencies/nanovdb"


def make_sphere(n=48, bg=0.0):
    x, y, z = np.mgrid[0:n, 0:n, 0:n].astype(np.float32)
    r = np.sqrt((x - n / 2) ** 2 + (y - n / 2) ** 2 + (z - n / 2) ** 2)
    d = np.where(r < n * 0.35, 1.0 - r / (n * 0.35), bg).astype(np.float32)
    d[d < 0.05] = bg  # sparsify: many all-background leaves
    return d


def test_nanovdb_roundtrip(tmp_path):
    d = make_sphere(48)
    p = str(tmp_path / "sphere.nvdb")
    write_nanovdb(p, d)
    dense, meta = read_nanovdb_dense(p)
    assert meta["grid_type"] == 1
    np.testing.assert_array_equal(meta["index_bbox"],
                                  [[0, 0, 0], [48, 48, 48]])
    np.testing.assert_allclose(dense, d)


def test_nanovdb_roundtrip_nonzero_background(tmp_path):
    d = make_sphere(24, bg=0.25)
    p = str(tmp_path / "s.nvdb")
    write_nanovdb(p, d, background=0.25)
    dense, meta = read_nanovdb_dense(p)
    assert meta["background"] == 0.25
    np.testing.assert_allclose(dense, d)


def test_nanovdb_multi_lower_nodes(tmp_path):
    # > 128 wide => multiple lower (16^3-leaf) nodes
    d = np.zeros((200, 40, 40), np.float32)
    d[5, 5, 5] = 3.0
    d[190, 30, 8] = 7.0
    p = str(tmp_path / "wide.nvdb")
    write_nanovdb(p, d)
    dense, _ = read_nanovdb_dense(p)
    np.testing.assert_allclose(dense, d)


def test_volume_testbed_from_nvdb(tmp_path):
    from instant_ngp_tpu.volume.testbed_volume import load_volume_grid

    d = make_sphere(32)
    p = str(tmp_path / "v.nvdb")
    write_nanovdb(p, d)
    grid = load_volume_grid(p)
    np.testing.assert_allclose(grid, d)


@pytest.mark.skipif(not os.path.isdir(NANOVDB_INC) or
                    shutil.which("g++") is None,
                    reason="vendored NanoVDB or g++ unavailable")
def test_nanovdb_layout_matches_real_accessor(tmp_path):
    """Compile the REAL NanoVDB reader and sample a file we wrote: proves
    our writer (and hence the reader that round-trips it) speaks the
    actual ABI 32.3 layout the reference consumes."""
    d = make_sphere(48)
    p = str(tmp_path / "x.nvdb")
    write_nanovdb(p, d)

    src = tmp_path / "probe.cpp"
    src.write_text(r"""
#include <nanovdb/NanoVDB.h>
#include <cstdio>
#include <cstring>
#include <fstream>
#include <vector>
int main(int argc, char** argv) {
    std::ifstream f(argv[1], std::ios::binary);
    char hdr[16], meta[176];
    f.read(hdr, 16); f.read(meta, 176);
    uint64_t gridSize; uint32_t nameSize;
    std::memcpy(&gridSize, meta, 8);
    std::memcpy(&nameSize, meta + 136, 4);
    std::vector<char> name(nameSize); f.read(name.data(), nameSize);
    std::vector<char> buf(gridSize); f.read(buf.data(), gridSize);
    auto* grid = reinterpret_cast<const nanovdb::FloatGrid*>(buf.data());
    if (!grid->isValid()) { std::printf("INVALID\n"); return 1; }
    auto acc = grid->tree().getAccessor();
    for (int i = 2; i + 2 < argc; i += 3)
        std::printf("%.9g\n", acc.getValue(nanovdb::Coord(
            atoi(argv[i]), atoi(argv[i+1]), atoi(argv[i+2]))));
    return 0;
}
""")
    exe = str(tmp_path / "probe")
    subprocess.run(["g++", "-std=c++14", "-O1", "-I", NANOVDB_INC,
                    str(src), "-o", exe], check=True)
    rng = np.random.RandomState(0)
    coords = rng.randint(0, 48, size=(64, 3))
    args = [exe, p] + [str(c) for c in coords.ravel()]
    out = subprocess.run(args, capture_output=True, text=True, check=True)
    got = np.array([float(v) for v in out.stdout.split()])
    want = d[coords[:, 0], coords[:, 1], coords[:, 2]]
    np.testing.assert_allclose(got, want, rtol=1e-6)
