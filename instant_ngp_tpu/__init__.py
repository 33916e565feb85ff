"""instant_ngp_tpu — a TPU-native neural graphics primitives framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
fnysalehi/instant-ngp-rendering (a fork of NVIDIA instant-ngp adding a
multi-object "Geometry" scene mode). The compute path is JAX + Pallas TPU
kernels; host-side irregular work (BVH queries, image decode) is C++ behind
ctypes with numpy fallbacks.

Layer map (cf. SURVEY.md §1):
  ops/       — encodings (hash grid, SH, frequency, ...), MLPs, losses,
               nested optimizers, trainer            (reference L0/L1: tiny-cuda-nn)
  nerf/      — occupancy grid, sampler, composite loss, wavefront renderer
               (reference L5: src/testbed_nerf.cu)
  image/     — 2D image fitting                      (src/testbed_image.cu)
  sdf/       — SDF fitting + sphere tracing          (src/testbed_sdf.cu)
  volume/    — volumetric path-traced fitting        (src/testbed_volume.cu)
  geometry/  — multi-object BVH scene mode (fork)    (src/testbed_geometry.cu)
  geom/      — triangle/Geometry BVH, octree, marching cubes (reference L2)
  data/      — dataset loaders, EXR/PNG/bin IO, snapshots    (reference L3)
  parallel/  — mesh/sharding helpers, multi-chip training    (reference §2.6)
  testbed.py — pyngp-compatible facade               (src/python_api.cu)
"""

__version__ = "0.1.0"

# Persistent compilation cache: compiles of the big jitted programs (the
# NeRF train step compiles in minutes through the tunneled TPU backend)
# are reused across processes. Harmless on CPU; speeds test reruns too.
import os as _os

import jax as _jax

_cache_dir = _os.environ.get(
    "INGP_JAX_CACHE",
    _os.path.join(_os.path.dirname(_os.path.dirname(
        _os.path.abspath(__file__))), ".jax_cache"))
try:
    if _os.environ.get("JAX_PLATFORMS", "") != "cpu":
        _jax.config.update("jax_compilation_cache_dir", _cache_dir)
        _jax.config.update(
            "jax_persistent_cache_min_compile_time_secs", 2.0)
except Exception:  # older jax without the knobs
    pass
