"""Geometry & acceleration structures (reference L2: src/triangle_bvh.cu,
triangle_octree.cuh, marching_cubes.cu). BVH queries run in native C++ on
the host; marching cubes and octrees are jnp/numpy."""

from .triangle_bvh import TriangleBvh, load_obj  # noqa: F401
