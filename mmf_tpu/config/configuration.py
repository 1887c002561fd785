"""Configuration build pipeline.

Parity with mmf/utils/configuration.py: YAML loading with recursive
``includes:`` merge, the defaults -> model config -> dataset configs ->
user config -> config_override -> CLI dotlist precedence chain, custom
resolvers (``device_count``, ``resolve_cache_dir``, ``resolve_dir``), zoo
config lookup with ``defaults:`` aliases, eager resolution, and
freeze/defrost.
"""

from __future__ import annotations

import collections.abc
import json
import logging
import os
import warnings
from ast import literal_eval
from typing import Any, Dict, List, Optional

from mmf_tpu.config import omega
from mmf_tpu.config.omega import ConfigNode

logger = logging.getLogger(__name__)


def get_mmf_root() -> str:
    from mmf_tpu.utils.general import get_mmf_root as _g
    return _g()


# ---------------------------------------------------------------------------
# resolvers (reference configuration.py:493-499)
# ---------------------------------------------------------------------------
def resolve_cache_dir(env_variable="MMF_CACHE_DIR", default="mmf"):
    # Find default cache path in ~/.cache or env override
    cache_path = os.path.join(os.path.expanduser("~"), ".cache", default)
    if not os.path.exists(cache_path):
        try:
            os.makedirs(cache_path, exist_ok=True)
        except PermissionError:
            cache_path = os.path.join(get_mmf_root(), ".mmf_cache")
            os.makedirs(cache_path, exist_ok=True)
    return os.environ.get(env_variable, cache_path)


def resolve_dir(env_variable, default="data"):
    default_dir = os.path.join(resolve_cache_dir(), default)
    return os.environ.get(env_variable, default_dir)


def _device_count():
    try:
        import jax
        return jax.device_count()
    except Exception:
        return 1


omega.register_resolver("device_count", lambda *a: _device_count())
omega.register_resolver("resolve_cache_dir", resolve_cache_dir)
omega.register_resolver("resolve_dir", resolve_dir)


# ---------------------------------------------------------------------------
# YAML loading with includes (reference configuration.py:21-82)
# ---------------------------------------------------------------------------
def load_yaml(f: str) -> ConfigNode:
    abs_f = f
    if not os.path.isabs(abs_f) and not os.path.exists(abs_f):
        # relative to mmf_tpu root (so "configs/..." works from anywhere)
        candidate = os.path.join(get_mmf_root(), abs_f)
        if os.path.exists(candidate):
            abs_f = candidate
        else:
            candidate = os.path.join(get_mmf_root(), "..", abs_f)
            if os.path.exists(candidate):
                abs_f = candidate

    mapping = omega.load(abs_f)
    if mapping is None:
        mapping = omega.create()

    includes = dict.get(mapping, "includes", [])
    if not isinstance(includes, collections.abc.Sequence):
        raise AttributeError(
            f"Includes must be a list, {type(includes)} provided"
        )

    include_mapping = omega.create()
    for include in includes:
        original_include = include
        if not os.path.isabs(include):
            # resolve relative to the including file first, then mmf root
            rel = os.path.join(os.path.dirname(abs_f), include)
            if os.path.exists(rel):
                include = rel
            else:
                include = os.path.join(get_mmf_root(), original_include)
                if not os.path.exists(include):
                    # repo root: lets project configs include other
                    # project configs (projects/...)
                    include = os.path.join(
                        get_mmf_root(), "..", original_include
                    )
        current_include_mapping = load_yaml(include)
        include_mapping = omega.merge(include_mapping, current_include_mapping)

    if "includes" in mapping:
        dict.pop(mapping, "includes")

    mapping = omega.merge(include_mapping, mapping)
    return mapping


def load_yaml_with_defaults(f: str) -> ConfigNode:
    default_config = get_default_config_path()
    return omega.merge(load_yaml(default_config), load_yaml(f))


def get_default_config_path() -> str:
    return os.path.join(os.path.dirname(os.path.abspath(__file__)), "defaults.yaml")


# ---------------------------------------------------------------------------
# zoo config (reference configuration.py:87-132)
# ---------------------------------------------------------------------------
def get_zoo_config(
    key: str,
    variation: str = "defaults",
    zoo_config_path: Optional[str] = None,
    zoo_type: str = "datasets",
):
    version = None
    resources = None
    if zoo_config_path is None:
        zoo_config_path = os.path.join("configs", "zoo", f"{zoo_type}.yaml")
    try:
        zoo = load_yaml(zoo_config_path)
    except FileNotFoundError:
        warnings.warn(f"Zoo config {zoo_config_path} not found; skipping")
        return version, resources

    # assume the config zoo has the same hierarchy as the keys
    for sub_key in key.split("."):
        if sub_key in zoo:
            zoo = zoo[sub_key]
        else:
            return version, resources

    # "defaults: ${...}" aliases resolve to the aliased node via
    # interpolation; a plain-string leaf is a key alias
    if isinstance(zoo, str):
        return get_zoo_config(zoo, "defaults", zoo_config_path, zoo_type)

    if variation not in zoo:
        # reference configuration.py:108-113 — when the variation is
        # absent, the selected node itself must be the resource record
        # (i.e. the full key incl. variation was passed directly)
        assert variation == "defaults", (
            f"'{variation}' variation not present in zoo config"
        )
        return _get_version_and_resources(zoo)
    elif "resources" in zoo:
        # full key passed directly, and it happens to have a sibling
        # named like the variation
        return _get_version_and_resources(zoo)
    else:
        node = zoo[variation]
        if isinstance(node, str):
            return get_zoo_config(node, "defaults", zoo_config_path, zoo_type)
        return _get_version_and_resources(node)


def _get_version_and_resources(item):
    if not isinstance(item, dict) or "version" not in item or (
        "resources" not in item
    ):
        return None, None
    return item["version"], item["resources"]


# ---------------------------------------------------------------------------
# global accessors (reference configuration.py:135-162)
# ---------------------------------------------------------------------------
def get_global_config(key: Optional[str] = None):
    from mmf_tpu.common.registry import registry

    config = registry.get("config")
    if config is None:
        configuration = Configuration()
        config = configuration.get_config()
        registry.register("config", config)
    if key:
        for k in key.split("."):
            config = config[k]
    return config


def get_mmf_env(key: Optional[str] = None):
    config = get_global_config()
    if key:
        return config["env"].get(key, None)
    return config["env"]


def get_mmf_cache_dir():
    config = get_global_config()
    cache_dir = config.env.cache_dir
    if not os.path.exists(cache_dir):
        candidate = os.path.join(get_mmf_root(), cache_dir)
        if os.path.exists(candidate):
            cache_dir = candidate
    return cache_dir


def _merge_with_dotlist(config, opts, dont_merge_keys=None):
    return omega.merge_with_dotlist(config, opts, strict=False)


# ---------------------------------------------------------------------------
# Configuration class (reference configuration.py:313-…)
# ---------------------------------------------------------------------------
class Configuration:
    def __init__(self, args=None, default_only: bool = False):
        self.config = {}
        self.args = args
        self._register_resolvers()

        self._default_config = self._build_default_config()

        if default_only:
            other_configs = {}
        else:
            other_configs = self._build_other_configs()

        self.config = omega.merge(self._default_config, other_configs)

        self.config = _merge_with_dotlist(self.config, self._get_opts())
        self._update_specific(self.config)
        self.upgrade(self.config)
        # resolve eagerly so the frozen config carries concrete values
        self.config = omega.resolve_all(self.config)
        omega.set_struct(self.config, True)

    # --------------------------------------------------------------
    def _get_opts(self) -> List[str]:
        if self.args is None:
            return []
        if isinstance(self.args, list):
            return self.args
        opts = getattr(self.args, "opts", None) or []
        return list(opts)

    def _build_default_config(self) -> ConfigNode:
        self.default_config_path = get_default_config_path()
        return load_yaml(self.default_config_path)

    def _build_other_configs(self) -> ConfigNode:
        opts_config = self._build_opt_list(self._get_opts())
        user_config = self._build_user_config(opts_config)

        self._opts_config = opts_config
        self.user_config = user_config

        args_overrides = self._build_demjson_config(
            getattr(self.args, "config_override", None) if self.args else None
        )

        other_configs = omega.merge(user_config, args_overrides)

        # model=/datasets= usually arrive as dotlist opts (the primary CLI
        # form), so include them when resolving which default configs to pull
        lookup = omega.merge(other_configs, opts_config)
        # user plugin dir must be imported BEFORE model/dataset config
        # resolution so plugin-registered classes are found (reference
        # configuration.py:393-410 precedence: env default -> user config
        # -> opts)
        self._import_user_dir(lookup)
        model_config = self._build_model_config(lookup)
        dataset_config = self._build_dataset_config(lookup)
        args_config = omega.merge(model_config, dataset_config, other_configs)
        return args_config

    def _import_user_dir(self, lookup) -> None:
        """Import the env.user_dir plugin directory (reference
        configuration.py:393-410): default env var, overridden by the
        user config yaml, overridden by dotlist opts."""
        import os

        user_dir = os.environ.get("MMF_USER_DIR", "") or None
        cfg_user_dir = (
            self._default_config.get("env", {}).get("user_dir", None)
        )
        if cfg_user_dir and "${" not in str(cfg_user_dir):
            user_dir = cfg_user_dir
        lookup_user_dir = (lookup.get("env", {}) or {}).get("user_dir", None)
        if lookup_user_dir:
            user_dir = lookup_user_dir
        if user_dir:
            from mmf_tpu.utils.env import import_user_module

            import_user_module(user_dir)

    def _build_opt_list(self, opts: List[str]) -> ConfigNode:
        # Turn dotlist into a nested config for peeking at config/model/datasets
        node = omega.create()
        try:
            omega.merge_with_dotlist(node, opts, strict=False)
        except Exception:
            pass
        return node

    def _build_user_config(self, opts_config) -> ConfigNode:
        user_config = omega.create()
        self.config_path = opts_config.get("config", None)
        if self.config_path is not None:
            user_config = load_yaml(self.config_path)
        return user_config

    def _build_demjson_config(self, demjson_string) -> ConfigNode:
        if demjson_string is None:
            return omega.create()
        try:
            demjson_dict = json.loads(demjson_string)
        except json.JSONDecodeError:
            demjson_dict = literal_eval(demjson_string)
        return omega.create(demjson_dict)

    def _build_model_config(self, config) -> ConfigNode:
        model = config.get("model", None)
        if model is None:
            return omega.create()

        from mmf_tpu.common.registry import registry

        model_cls = registry.get_model_class(model)
        if model_cls is None:
            warning = f"No model named '{model}' has been registered"
            warnings.warn(warning)
            return omega.create()

        default_model_config_path = model_cls.config_path()
        if default_model_config_path is None:
            warnings.warn(f"Model {model} has no default config")
            return omega.create()
        return load_yaml(default_model_config_path)

    def _build_dataset_config(self, config) -> ConfigNode:
        dataset = config.get("dataset", None)
        datasets = config.get("datasets", None)
        if dataset is None and datasets is None:
            return omega.create()
        if dataset is not None and datasets is None:
            datasets = dataset

        if isinstance(datasets, str):
            datasets = list(map(lambda x: x.strip(), datasets.split(",")))

        dataset_config = omega.create()
        from mmf_tpu.common.registry import registry

        for d in datasets:
            builder_cls = registry.get_builder_class(d)
            if builder_cls is None:
                warning = f"No dataset named '{d}' has been registered"
                warnings.warn(warning)
                continue
            default_dataset_config_path = builder_cls.config_path()
            if default_dataset_config_path is None:
                continue
            dataset_config = omega.merge(
                dataset_config, load_yaml(default_dataset_config_path)
            )
        return dataset_config

    # --------------------------------------------------------------
    def get_config(self) -> ConfigNode:
        self._register_resolvers()
        return self.config

    def _register_resolvers(self):
        omega.register_resolver("device_count", lambda *a: _device_count())
        omega.register_resolver("resolve_cache_dir", resolve_cache_dir)
        omega.register_resolver("resolve_dir", resolve_dir)

    def freeze(self):
        omega.set_struct(self.config, True)

    def defrost(self):
        omega.set_struct(self.config, False)

    def _update_specific(self, config):
        # `dataset=` (singular, the documented CLI form) populates
        # `datasets`, the canonical key the trainer reads
        # (reference configuration.py:560-575)
        dataset = config.get("dataset", None)
        if dataset is not None and not config.get("datasets", None):
            warnings.warn(
                "'dataset' is deprecated in favor of 'datasets'; "
                "setting datasets from it"
            )
            config["datasets"] = dataset

        # batch size vs batch_size_per_device mutual exclusion warning
        tc = config.get("training", None)
        if tc is not None and tc.get("batch_size_per_device", None) is not None:
            logger.info(
                "batch_size_per_device is set; global batch_size will be "
                "computed as per_device * num_data_shards"
            )
        return config

    def upgrade(self, config):
        mapping = {
            "training.resume_file": "checkpoint.resume_file",
            "training.resume": "checkpoint.resume",
            "training.resume_best": "checkpoint.resume_best",
            "training.load_pretrained": "checkpoint.resume_pretrained",
            "training.pretrained_state_mapping": "checkpoint.pretrained_state_mapping",
            "training.run_type": "run_type",
        }
        for old, new in mapping.items():
            value = self._get_dotted(config, old)
            if value is not None:
                self._set_dotted(config, new, value)

    @staticmethod
    def _get_dotted(config, key):
        cur = config
        for part in key.split("."):
            if isinstance(cur, dict) and part in cur:
                cur = cur[part]
            else:
                return None
        return cur

    @staticmethod
    def _set_dotted(config, key, value):
        parts = key.split(".")
        cur = config
        for part in parts[:-1]:
            if part not in cur:
                cur[part] = {}
            cur = cur[part]
        cur[parts[-1]] = value

    def pretty_print(self):
        if not self.config.training.log_detailed_config:
            return
        logger.info("=====  Training Parameters    =====")
        logger.info(omega.to_yaml(self.config.training))
        logger.info("======  Dataset Attributes  ======")
        for dataset in self.config.datasets:
            if dataset in self.config.dataset_config:
                logger.info(f"======== {dataset} =======")
                logger.info(omega.to_yaml(self.config.dataset_config[dataset]))
        logger.info("======  Optimizer Attributes  ======")
        logger.info(omega.to_yaml(self.config.optimizer))
        logger.info(f"======  Model ({self.config.model}) Attributes  ======")
        logger.info(omega.to_yaml(self.config.model_config[self.config.model]))
