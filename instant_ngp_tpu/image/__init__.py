"""Image mode: gigapixel 2D image fitting (reference src/testbed_image.cu)."""

from .testbed_image import ImageTestbed  # noqa: F401
