import json
import os

import pytest

from instant_ngp_tpu.config import (
    deep_merge, find_network_config, get_path, load_network_config,
    loads_json, set_path, strip_json_comments)


def test_strip_comments():
    text = '{"a": 1, // comment\n "b": "http://x", /* block */ "c": 2}'
    assert loads_json(text) == {"a": 1, "b": "http://x", "c": 2}


def test_deep_merge():
    base = {"opt": {"otype": "Ema", "nested": {"lr": 1e-2, "otype": "Adam"}}, "x": 1}
    over = {"opt": {"nested": {"lr": 1e-4}}, "y": 2}
    merged = deep_merge(base, over)
    assert merged["opt"]["nested"] == {"lr": 1e-4, "otype": "Adam"}
    assert merged["opt"]["otype"] == "Ema"
    assert merged["x"] == 1 and merged["y"] == 2
    # base not mutated
    assert base["opt"]["nested"]["lr"] == 1e-2


def test_parent_inheritance(tmp_path):
    (tmp_path / "base.json").write_text(json.dumps(
        {"loss": {"otype": "Huber"}, "encoding": {"n_levels": 16, "otype": "HashGrid"}}))
    (tmp_path / "child.json").write_text(json.dumps(
        {"parent": "base.json", "encoding": {"n_levels": 8}}))
    cfg = load_network_config(str(tmp_path / "child.json"))
    assert "parent" not in cfg
    assert cfg["loss"]["otype"] == "Huber"
    assert cfg["encoding"] == {"n_levels": 8, "otype": "HashGrid"}


def test_parent_chain(tmp_path):
    (tmp_path / "a.json").write_text('{"x": 1, "y": 1, "z": 1}')
    (tmp_path / "b.json").write_text('{"parent": "a.json", "y": 2}')
    (tmp_path / "c.json").write_text('{"parent": "b.json", "z": 3}')
    cfg = load_network_config(str(tmp_path / "c.json"))
    assert cfg == {"x": 1, "y": 2, "z": 3}


def test_find_network_config(tmp_path):
    mode_dir = tmp_path / "nerf"
    mode_dir.mkdir()
    (mode_dir / "base.json").write_text("{}")
    path = find_network_config("base", mode="nerf", search_paths=[str(tmp_path)])
    assert path == str(mode_dir / "base.json")
    with pytest.raises(FileNotFoundError):
        find_network_config("nonexistent", mode="nerf", search_paths=[str(tmp_path)])


def test_reference_configs_load():
    ref = "/root/reference/configs"
    if not os.path.isdir(ref):
        pytest.skip("no reference configs")
    # every shipped config must parse (incl. //-commented image/base.json)
    for mode in os.listdir(ref):
        for name in os.listdir(os.path.join(ref, mode)):
            cfg = load_network_config(os.path.join(ref, mode, name))
            assert isinstance(cfg, dict) and "parent" not in cfg
    cfg = load_network_config(os.path.join(ref, "nerf", "small.json"))
    # deep-merged override of base.json (configs/nerf/small.json)
    assert cfg["optimizer"]["nested"]["decay_start"] == 10000
    assert cfg["optimizer"]["nested"]["otype"] == "ExponentialDecay"
    assert cfg["encoding"]["log2_hashmap_size"] == 15
    assert cfg["encoding"]["n_levels"] == 8


def test_get_set_path():
    cfg = {"optimizer": {"nested": {"nested": {"learning_rate": 1e-2}}}}
    assert get_path(cfg, "optimizer.nested.nested.learning_rate") == 1e-2
    set_path(cfg, "optimizer.nested.nested.learning_rate", 5.0)
    assert cfg["optimizer"]["nested"]["nested"]["learning_rate"] == 5.0


def test_parent_cycle_raises(tmp_path):
    (tmp_path / "a.json").write_text('{"parent": "b.json"}')
    (tmp_path / "b.json").write_text('{"parent": "a.json"}')
    with pytest.raises(ValueError, match="cyclic"):
        load_network_config(str(tmp_path / "a.json"))


def test_config_zoo_carries_variance_schedule():
    """The variance schedule (stochastic_corners_until) ships in the
    grid-encoding config zoo files — not as a code default — so config
    and snapshot round-trips preserve it, and the testbeds pick it up
    from the loaded config."""
    repo = os.path.join(os.path.dirname(__file__), "..")
    for rel in ("configs/image/base.json", "configs/sdf/base.json",
                "configs/volume/base.json"):
        cfg = load_network_config(os.path.join(repo, rel))
        assert cfg["encoding"]["stochastic_corners_until"] == 256, rel

    import numpy as np

    from instant_ngp_tpu.image.testbed_image import ImageTestbed

    cfg = load_network_config(os.path.join(repo, "configs/image/base.json"))
    cfg["encoding"]["stochastic_corners_until"] = 7
    img = np.random.default_rng(0).random((16, 16, 3), np.float32)
    tb = ImageTestbed(img, cfg)
    assert tb.stochastic_corners_until == 7
