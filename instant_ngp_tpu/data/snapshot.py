"""Checkpoint / snapshot save-load: msgpack, optionally zlib-compressed.

Mirrors the reference snapshot design (save_snapshot/load_snapshot,
src/testbed.cu:4775-4978):
- the network config is EMBEDDED in the snapshot so loading re-creates the
  model without external files;
- full trainer state (params + optimizer moments + EMA copy) is optional
  via `serialize_optimizer`;
- a format-version gate rejects incompatible snapshots
  (SNAPSHOT_FORMAT_VERSION, src/testbed.cu:4779,4843);
- `.ingp` filenames get zlib compression, bare `.msgpack` stays raw.

Arrays (numpy or jax) are stored as raw little-endian bytes with dtype and
shape so snapshots are language- and device-independent. Pytrees keep
their dict/list structure directly in msgpack.
"""

from __future__ import annotations

import io
import os
import zlib
from typing import Any, Dict

import msgpack
import numpy as np

SNAPSHOT_FORMAT_VERSION = 1

_ARRAY_KEY = "__ndarray__"


def _pack_leaf(obj):
    if hasattr(obj, "dtype") and hasattr(obj, "shape"):  # numpy or jax array
        arr = np.asarray(obj)
        if str(arr.dtype) == "bfloat16":  # no portable on-disk bf16; widen
            arr = arr.astype(np.float32)
        return {
            _ARRAY_KEY: True,
            "dtype": str(arr.dtype),
            "shape": list(arr.shape),
            "data": arr.tobytes(),
        }
    if isinstance(obj, (np.integer,)):
        return int(obj)
    if isinstance(obj, (np.floating,)):
        return float(obj)
    raise TypeError(f"cannot serialize {type(obj)} into a snapshot")


def pack_tree(tree: Any) -> Any:
    """Recursively convert a pytree into msgpack-encodable structures."""
    if isinstance(tree, dict):
        return {k: pack_tree(v) for k, v in tree.items()}
    if isinstance(tree, (list, tuple)):
        return [pack_tree(v) for v in tree]
    if tree is None or isinstance(tree, (bool, int, float, str, bytes)):
        return tree
    return _pack_leaf(tree)


def unpack_tree(obj: Any) -> Any:
    """Inverse of pack_tree; arrays come back as numpy (device_put later)."""
    if isinstance(obj, dict):
        if obj.get(_ARRAY_KEY):
            arr = np.frombuffer(obj["data"], dtype=np.dtype(obj["dtype"]))
            return arr.reshape(obj["shape"]).copy()
        return {k: unpack_tree(v) for k, v in obj.items()}
    if isinstance(obj, list):
        return [unpack_tree(v) for v in obj]
    return obj


def save_snapshot(path: str, snapshot: Dict[str, Any]) -> None:
    """Write a snapshot dict. Caller provides at minimum:
    {"config": <network config json>, "trainer": <state pytree>, ...}.
    Mode-specific extras (density grid, camera optimizers, dataset
    metadata) ride along as additional keys."""
    payload = dict(snapshot)
    payload["snapshot_format_version"] = SNAPSHOT_FORMAT_VERSION
    raw = msgpack.packb(pack_tree(payload), use_bin_type=True)
    if path.endswith(".ingp"):
        raw = zlib.compress(raw, level=6)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(raw)
    os.replace(tmp, path)


def load_snapshot(path: str) -> Dict[str, Any]:
    with open(path, "rb") as f:
        raw = f.read()
    if path.endswith(".ingp") or raw[:2] == b"\x78\x9c" or raw[:2] == b"\x78\x01":
        raw = zlib.decompress(raw)
    payload = unpack_tree(msgpack.unpackb(raw, raw=False, strict_map_key=False))
    version = payload.get("snapshot_format_version")
    if version != SNAPSHOT_FORMAT_VERSION:
        raise ValueError(
            f"snapshot format version {version} incompatible with "
            f"{SNAPSHOT_FORMAT_VERSION} (reference gates the same way, "
            f"src/testbed.cu:4843-4845)")
    return payload
