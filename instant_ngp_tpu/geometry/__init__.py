"""Geometry mode (fork feature): multi-object scenes of meshes + NeRFs
(reference src/testbed_geometry.cu, src/geometry_bvh.cu)."""

from .testbed_geometry import GeometryTestbed  # noqa: F401
from .geometry_bvh import GeometryBvh  # noqa: F401
