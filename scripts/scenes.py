"""Named scene registry (reference scripts/scenes.py:51-113): maps short
names to dataset paths + recommended configs, used by run.py-style
drivers and benchmarks."""

import os

REFERENCE_DATA = os.environ.get("INGP_DATA", "/root/reference/data")

scenes_nerf = {
    "fox": {"data_dir": os.path.join(REFERENCE_DATA, "nerf", "fox"),
            "dataset": "transforms.json", "aabb_scale": 4,
            "network": "base.json"},
    "campfire": {"data_dir": os.path.join(REFERENCE_DATA, "nerf",
                                          "campfire"),
                 "dataset": "transforms.json", "network": "base.json"},
    "test": {"data_dir": os.path.join(REFERENCE_DATA, "nerf", "test"),
             "dataset": "transforms.json", "network": "base.json"},
    # nerf-synthetic scenes resolve relative to INGP_DATA when present
    **{name: {"data_dir": os.path.join(REFERENCE_DATA, "nerf_synthetic",
                                       name),
              "dataset": "transforms_train.json", "aabb_scale": 1,
              "network": "base.json"}
       for name in ["lego", "chair", "drums", "ficus", "hotdog",
                    "materials", "mic", "ship"]},
}

scenes_sdf = {
    "armadillo": {"data_dir": os.path.join(REFERENCE_DATA, "sdf"),
                  "dataset": "armadillo.obj", "network": "base.json"},
    "bunny": {"data_dir": os.path.join(REFERENCE_DATA, "sdf"),
              "dataset": "bunny.obj", "network": "base.json"},
}

scenes_image = {
    "albert": {"data_dir": os.path.join(REFERENCE_DATA, "image"),
               "dataset": "albert.exr", "network": "base.json"},
}

scenes_volume = {
    # .nvdb assets are downloaded separately (e.g. Disney cloud)
}

scenes_geometry = {
    "geometrypaths": {"data_dir": os.path.join(REFERENCE_DATA, "geometry"),
                      "dataset": "geometrypaths.json"},
}


def get_scene(name: str):
    for registry in (scenes_nerf, scenes_sdf, scenes_image, scenes_volume,
                     scenes_geometry):
        if name in registry:
            entry = registry[name]
            return os.path.join(entry["data_dir"], entry["dataset"]), entry
    return None, None
