"""SDF mode: neural signed-distance fitting + sphere tracing
(reference src/testbed_sdf.cu)."""

from .testbed_sdf import SdfTestbed  # noqa: F401
