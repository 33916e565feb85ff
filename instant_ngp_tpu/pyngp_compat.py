"""pyngp compatibility shim: `import instant_ngp_tpu.pyngp_compat as ngp`
gives scripts written against the reference's pybind11 module
(src/python_api.cu:266-446) the same names — Testbed, the enums, and the
module-level free functions. Geometry mode IS exposed here (the reference
leaves it out of pyngp, python_api.cu:268-273)."""

from .common import (Activation, ColorSpace,  # noqa: F401
                     GroundTruthRenderMode, LensMode, LossType,
                     MeshSdfMode, RenderMode, SDFGroundTruthMode,
                     TestbedMode, TonemapCurve)
from .testbed import Testbed, mode_from_scene  # noqa: F401

# pyngp spells the mode enum values like this
NerfMode = TestbedMode.Nerf
SdfMode = TestbedMode.Sdf
ImageMode = TestbedMode.Image
VolumeMode = TestbedMode.Volume
GeometryMode = TestbedMode.Geometry


def free_temporary_memory() -> None:
    """pyngp API parity: JAX manages device memory; nothing to free."""
