"""Volume mode: neural radiance cache of a scattering medium
(reference src/testbed_volume.cu)."""

from .testbed_volume import VolumeTestbed, load_nanovdb_header  # noqa: F401
