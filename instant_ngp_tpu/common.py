"""Shared enums, constants and tiny value types.

Mirrors the reference's include/neural-graphics-primitives/common.h:56-150
(enums) and nerf_device.cuh:24-42 (march constants). Values and names are
kept so configs / snapshots / Python API surface stay compatible.
"""

from __future__ import annotations

import enum
import math
from dataclasses import dataclass, field

import numpy as np


class TestbedMode(enum.Enum):
    # reference: common.h ETestbedMode (+ the fork's Geometry mode)
    Nerf = "nerf"
    Sdf = "sdf"
    Image = "image"
    Volume = "volume"
    Geometry = "geometry"
    NONE = "none"


class LossType(enum.Enum):
    # reference: common.h:79-88 ELossType; string mapping src/testbed.cu:3592-3611
    L2 = "L2"
    L1 = "L1"
    Mape = "MAPE"
    Smape = "SMAPE"
    Huber = "Huber"
    LogL1 = "LogL1"
    RelativeL2 = "RelativeL2"


class Activation(enum.Enum):
    # reference: tcnn activations used by NGP (nerf.h:151-153)
    NONE = "None"
    ReLU = "ReLU"
    Logistic = "Logistic"
    Exponential = "Exponential"
    Sine = "Sine"
    Squareplus = "Squareplus"
    Softplus = "Softplus"


class ColorSpace(enum.Enum):
    # reference: common.h EColorSpace
    Linear = "Linear"
    SRGB = "SRGB"


class TonemapCurve(enum.Enum):
    # reference: common.h ETonemapCurve (render_buffer.cu tonemap)
    Identity = "Identity"
    ACES = "ACES"
    Hable = "Hable"
    Reinhard = "Reinhard"


class RenderMode(enum.Enum):
    # reference: common.h:56-67 ERenderMode
    AO = "AO"
    Shade = "Shade"
    Normals = "Normals"
    Positions = "Positions"
    Depth = "Depth"
    Distance = "Distance"
    Stepsize = "Stepsize"
    Distortion = "Distortion"
    Cost = "Cost"
    Slice = "Slice"
    EncodingVis = "EncodingVis"


class GroundTruthRenderMode(enum.Enum):
    # reference: common.h EGroundTruthRenderMode
    Render = "Render"
    PSNR = "PSNR"
    SSIM = "SSIM"


class SDFGroundTruthMode(enum.Enum):
    # reference: common.h:146-150 ESDFGroundTruthMode
    RaytracedMesh = "RaytracedMesh"
    SpheretracedMesh = "SpheretracedMesh"
    SDFBricks = "SDFBricks"


class MeshSdfMode(enum.Enum):
    # reference: common.h:98-103 EMeshSdfMode
    Watertight = "Watertight"
    Raystab = "Raystab"
    PathEscape = "PathEscape"


class LensMode(enum.Enum):
    # reference: common.h ELensMode (lens distortion models, common_device.cuh:249-391)
    Perspective = "Perspective"
    OpenCV = "OpenCV"
    FTheta = "FTheta"
    LatLong = "LatLong"
    OpenCVFisheye = "OpenCVFisheye"
    Equirectangular = "Equirectangular"


# ---------------------------------------------------------------------------
# NeRF march constants — reference nerf_device.cuh:24-42
# ---------------------------------------------------------------------------

NERF_GRIDSIZE = 128                    # occupancy grid resolution per cascade
NERF_CASCADES = 8                      # max number of cascaded grids (mips)
NERF_GRID_N_CELLS = NERF_GRIDSIZE ** 3

SQRT3 = math.sqrt(3.0)
STEPS_PER_UNIT = 1024.0                # reference: 1024 steps across the unit cube
MIN_CONE_STEPSIZE = SQRT3 / STEPS_PER_UNIT
# Maximum step size is the width of the coarsest gridsize cell.
MAX_CONE_STEPSIZE = SQRT3 * (1 << (NERF_CASCADES - 1)) / STEPS_PER_UNIT

NERF_MIN_OPTICAL_THICKNESS = 0.01      # density threshold for occupancy bitfield

# Loss scale for mixed-precision training — reference testbed.h:386-390
DEFAULT_LOSS_SCALE = 128.0


@dataclass
class Ray:
    """A ray with origin o and direction d. reference common.h `Ray`."""

    o: np.ndarray
    d: np.ndarray

    def at(self, t: float) -> np.ndarray:
        return self.o + t * self.d


@dataclass
class BoundingBox:
    """Axis-aligned box, numpy host-side twin of bounding_box.cuh.

    Device code uses plain (min, max) jnp arrays; this class is for host
    logic (scene setup, BVH build, snapshots).
    """

    min: np.ndarray = field(default_factory=lambda: np.full(3, np.inf, np.float32))
    max: np.ndarray = field(default_factory=lambda: np.full(3, -np.inf, np.float32))

    @staticmethod
    def unit() -> "BoundingBox":
        return BoundingBox(np.zeros(3, np.float32), np.ones(3, np.float32))

    @staticmethod
    def from_points(pts: np.ndarray) -> "BoundingBox":
        return BoundingBox(pts.min(0).astype(np.float32), pts.max(0).astype(np.float32))

    def enlarge(self, other: "BoundingBox") -> None:
        self.min = np.minimum(self.min, other.min)
        self.max = np.maximum(self.max, other.max)

    def inflate(self, amount: float) -> None:
        self.min = self.min - amount
        self.max = self.max + amount

    @property
    def center(self) -> np.ndarray:
        return 0.5 * (self.min + self.max)

    @property
    def diag(self) -> np.ndarray:
        return self.max - self.min

    def relative_pos(self, p: np.ndarray) -> np.ndarray:
        return (p - self.min) / np.maximum(self.diag, 1e-12)

    def contains(self, p: np.ndarray) -> np.ndarray:
        return np.all((p >= self.min) & (p <= self.max), axis=-1)


def srgb_to_linear(x):
    """sRGB→linear, elementwise; reference common_device.cuh srgb_to_linear."""
    import numpy as _np

    x = _np.asarray(x)
    return _np.where(x <= 0.04045, x / 12.92, ((x + 0.055) / 1.055) ** 2.4)


def linear_to_srgb(x):
    """linear→sRGB, elementwise; reference common_device.cuh linear_to_srgb."""
    import numpy as _np

    x = _np.asarray(x)
    return _np.where(x <= 0.0031308, 12.92 * x, 1.055 * _np.maximum(x, 1e-12) ** (1.0 / 2.4) - 0.055)


def next_multiple(value: int, divisor: int) -> int:
    return ((value + divisor - 1) // divisor) * divisor


def powi(base: float, exp: int) -> float:
    return float(base) ** int(exp)
