import os
import textwrap

import pytest

from mmf_tpu.config import omega
from mmf_tpu.config.configuration import Configuration, load_yaml


def test_defaults_load():
    cfg = Configuration(default_only=True).get_config()
    assert cfg.training.batch_size == 512
    assert cfg.training.max_updates == 22000
    assert cfg.checkpoint.resume is False
    assert cfg.training.early_stop.criteria == "total_loss"
    # interpolation resolved eagerly
    assert cfg.training.wandb.name == "run"
    assert isinstance(cfg.distributed.world_size, int)


def test_struct_freeze():
    cfg = Configuration(default_only=True).get_config()
    with pytest.raises(AttributeError):
        cfg.training.new_key = 1
    with omega.open_dict(cfg):
        cfg.training.new_key = 1
    assert cfg.training.new_key == 1


def test_dotlist_overrides():
    cfg = Configuration(
        ["training.batch_size=64", "training.early_stop.enabled=True",
         "datasets=vqa2", "model=visual_bert"]
    ).get_config()
    assert cfg.training.batch_size == 64
    assert cfg.training.early_stop.enabled is True
    assert cfg.datasets == "vqa2"


def test_dotlist_array_syntax():
    cfg = omega.create({"a": {"b": [1, 2, 3]}})
    omega.merge_with_dotlist(cfg, ["a.b[1]=9"])
    assert cfg.a.b[1] == 9


def test_yaml_includes(tmp_path):
    base = tmp_path / "base.yaml"
    base.write_text(
        textwrap.dedent(
            """
            model_config:
              m:
                hidden: 4
                layers: 2
            """
        )
    )
    child = tmp_path / "child.yaml"
    child.write_text(
        textwrap.dedent(
            f"""
            includes:
              - {base}
            model_config:
              m:
                hidden: 8
            """
        )
    )
    cfg = load_yaml(str(child))
    assert cfg.model_config.m.hidden == 8
    assert cfg.model_config.m.layers == 2


def test_env_resolver(monkeypatch):
    monkeypatch.setenv("MMF_SAVE_DIR", "/tmp/mmf_test_save")
    cfg = Configuration(default_only=True).get_config()
    assert cfg.env.save_dir == "/tmp/mmf_test_save"


def test_interpolation_nested():
    cfg = omega.create({"a": {"x": 5}, "b": "${a.x}", "c": "v=${a.x}"})
    assert cfg.b == 5
    assert cfg.c == "v=5"


def test_singular_dataset_opt_populates_datasets():
    """`dataset=` (the documented mmf_run form) must flow into
    config.datasets, which the trainer reads."""
    cfg = Configuration(["dataset=vqa2", "model=visual_bert"]).get_config()
    assert cfg.datasets == "vqa2"
    # plural form wins when both are given
    cfg2 = Configuration(["dataset=vqa2", "datasets=clevr"]).get_config()
    assert cfg2.datasets == "clevr"


def test_interpolation_inside_lists_resolves():
    cfg = Configuration(default_only=True)
    node = omega.create({
        "size": {"w": 224},
        "params": {"image_size": ["${size.w}", "${size.w}"]},
    })
    resolved = omega.resolve_all(node)
    assert resolved.params.image_size == [224, 224]


def test_user_dir_plugin_imported_during_configuration():
    """env.user_dir plugins must be importable BEFORE model/dataset config
    resolution (reference configuration.py:393-410 + env.py:32-97)."""
    import os

    from mmf_tpu.common.registry import registry
    from mmf_tpu.config.configuration import Configuration

    registry.unregister("__mmf_user_dir_imported__")
    user_dir = os.path.join(os.path.dirname(__file__), "..", "data", "user_dir")
    Configuration([
        "model=always_one",
        "datasets=plugin_numbers",
        f"env.user_dir={user_dir}",
    ])
    try:
        assert registry.get_model_class("always_one") is not None
        assert registry.get_builder_class("plugin_numbers") is not None
    finally:
        registry.unregister("__mmf_user_dir_imported__")
