"""Every shipped YAML must parse, and every registered model/builder with
a config_path must point at an existing file that resolves through
Configuration (the reference's test_configs_for_keys idea)."""

import glob
import os

import pytest
import yaml

from mmf_tpu.common.registry import registry
from mmf_tpu.utils.env import setup_imports

setup_imports()

REPO = os.path.join(os.path.dirname(__file__), "..", "..")
PKG = os.path.join(REPO, "mmf_tpu")


def _all_yamls():
    return sorted(
        glob.glob(os.path.join(PKG, "configs", "**", "*.yaml"),
                  recursive=True)
        + glob.glob(os.path.join(REPO, "projects", "**", "*.yaml"),
                    recursive=True)
        + [os.path.join(PKG, "config", "defaults.yaml")]
    )


def test_every_yaml_parses():
    files = _all_yamls()
    assert len(files) > 80
    for path in files:
        with open(path) as f:
            yaml.safe_load(f)  # raises on malformed yaml


def test_model_config_paths_exist():
    missing = []
    for name in registry.list_models():
        cls = registry.get_model_class(name)
        path = cls.config_path()
        if path is None:
            continue
        if not os.path.exists(os.path.join(PKG, path)):
            missing.append((name, path))
    assert not missing, f"model config files missing: {missing}"


def test_builder_config_paths_exist():
    missing = []
    for name, cls in registry.mapping["builder_name_mapping"].items():
        path = cls.config_path() if hasattr(cls, "config_path") else None
        if path is None:
            continue
        if not os.path.exists(os.path.join(PKG, path)):
            missing.append((name, path))
    assert not missing, f"builder config files missing: {missing}"


def test_model_configs_define_their_section():
    """Each model's default yaml must define model_config.<name> (or for
    aliases, at least a model_config section)."""
    from mmf_tpu.config.configuration import load_yaml

    bad = []
    for name in registry.list_models():
        cls = registry.get_model_class(name)
        path = cls.config_path()
        if path is None:
            continue
        cfg = load_yaml(path)
        if "model_config" not in cfg:
            bad.append((name, path))
    assert not bad, f"model configs without model_config section: {bad}"


def test_every_project_config_resolves_includes():
    """Loading each project yaml through load_yaml must resolve its whole
    includes: chain (catches dangling include paths as configs grow)."""
    from mmf_tpu.config.configuration import load_yaml

    files = sorted(
        glob.glob(os.path.join(REPO, "projects", "**", "*.yaml"),
                  recursive=True)
    )
    assert len(files) > 100
    for path in files:
        cfg = load_yaml(path)
        assert cfg is not None, path
