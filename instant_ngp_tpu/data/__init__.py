"""Dataset loaders and image I/O (reference L3: src/nerf_loader.cu,
src/tinyexr_wrapper.cu, src/tinyobj_loader_wrapper.cu, snapshot code)."""
