"""Model factory with the reference's auto-derivation rules.

`reset_network` (src/testbed.cu:3679-3723) patches grid-encoding configs
before instantiation:
- n_levels may come from a flat `n_features` count;
- base_resolution defaults to 2^(log2_hashmap_size / n_pos);
- per_level_scale, when absent/0, is derived so the finest level hits a
  mode-dependent desired resolution over the scene extent:
      b = exp(ln(desired_resolution * aabb_scale / base_resolution)/(L-1))
  with desired_resolution = 2048 (nerf), max(image res)/2 (image),
  world2index_scale (volume).
"""

from __future__ import annotations

import math
from typing import Any, Dict, Tuple

from .encodings import create_encoding
from .mlp import MLP, NetworkWithInputEncoding


def derive_grid_config(encoding_config: Dict[str, Any], n_pos: int,
                       desired_resolution: float = 2048.0,
                       aabb_scale: float = 1.0) -> Dict[str, Any]:
    """Return a copy of encoding_config with auto-derived grid params."""
    cfg = dict(encoding_config)
    otype = str(cfg.get("otype", "OneBlob"))
    if "grid" not in otype.lower():
        return cfg

    n_features_per_level = cfg.get("n_features_per_level", 2)
    if cfg.get("n_features", 0) > 0:
        cfg["n_levels"] = int(cfg["n_features"]) // int(n_features_per_level)
    n_levels = cfg.get("n_levels", 16)

    log2_hashmap_size = cfg.get("log2_hashmap_size", 15)
    if not cfg.get("base_resolution", 0):
        cfg["base_resolution"] = 1 << (int(log2_hashmap_size) // n_pos)

    if cfg.get("per_level_scale", 0.0) <= 0.0 and n_levels > 1:
        cfg["per_level_scale"] = math.exp(
            math.log(desired_resolution * aabb_scale / cfg["base_resolution"])
            / (n_levels - 1))
    return cfg


def create_network_with_encoding(
        n_input_dims: int, n_output_dims: int, config: Dict[str, Any],
        desired_resolution: float = 2048.0, aabb_scale: float = 1.0,
        compute_dtype=None) -> Tuple[NetworkWithInputEncoding, Dict[str, Any]]:
    """Build encoding|>MLP from a full network config (the non-NeRF path of
    reset_network, src/testbed.cu:3816-3840). Returns (model, resolved cfg)."""
    enc_cfg = derive_grid_config(config.get("encoding", {}), n_input_dims,
                                 desired_resolution, aabb_scale)
    encoding = create_encoding(n_input_dims, enc_cfg)
    net_kwargs = {}
    if compute_dtype is not None:
        net_kwargs["compute_dtype"] = compute_dtype
    network = MLP.from_config(encoding.n_output_dims, n_output_dims,
                              config.get("network", {}), **net_kwargs)
    resolved = dict(config)
    resolved["encoding"] = enc_cfg
    return NetworkWithInputEncoding(encoding, network), resolved
