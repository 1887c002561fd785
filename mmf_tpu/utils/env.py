"""Environment setup: seeding, auto-registration imports, user plugins.

Parity with mmf/utils/env.py — ``setup_imports`` glob-imports every module
under datasets/models/modules/trainers/common so ``@registry.register_*``
decorators run; ``import_user_module`` loads a user plugin directory that
extends the registry from outside the package.
"""

from __future__ import annotations

import glob
import importlib
import logging
import os
import random
import sys
from datetime import datetime

logger = logging.getLogger(__name__)


def set_seed(seed):
    if seed:
        if seed == -1:
            # random seed between 1 and 100000 (parity with reference env.py:16)
            seed = random.randint(1, 1000000)
        random.seed(seed)
        import numpy as np

        np.random.seed(seed % (2 ** 32))
    return seed


def import_user_module(user_dir: str):
    """Import python files in a user folder so its registry registrations
    run (reference env.py:32-97).

    The import is cached PER RESOLVED PATH: two different plugin dirs
    that share a basename (e.g. anything named ``user_dir``) must not
    shadow each other through sys.modules, so a stale same-name module
    from another path is evicted and re-imported."""
    from mmf_tpu.common.registry import registry
    from mmf_tpu.utils.general import get_absolute_path

    if user_dir:
        user_dir = os.path.expanduser(user_dir)
        user_dir = get_absolute_path(user_dir)
        imported = registry.get("__mmf_user_dir_imported__", no_warning=True)
        if not isinstance(imported, set):
            imported = set()
        if user_dir in imported:
            logger.info(f"User dir {user_dir} already imported. Skipping.")
            return
        module_parent, module_name = os.path.split(user_dir)

        existing = sys.modules.get(module_name)
        existing_dir = None
        if existing is not None:
            existing_file = getattr(existing, "__file__", None) or ""
            existing_dir = os.path.dirname(os.path.realpath(existing_file))
            for p in getattr(existing, "__path__", []) or []:
                existing_dir = os.path.realpath(p)
        if existing is not None and existing_dir != os.path.realpath(user_dir):
            # same basename, different plugin dir: evict it (and its
            # submodules) so this dir's registrations actually run
            for k in [
                k for k in sys.modules
                if k == module_name or k.startswith(module_name + ".")
            ]:
                del sys.modules[k]
            existing = None
        if existing is None:
            sys.path.insert(0, module_parent)
            try:
                importlib.import_module(module_name)
            finally:
                sys.path.pop(0)

        logger.info(f"Importing from {user_dir}")
        imported.add(user_dir)
        registry.register("__mmf_user_dir_imported__", imported)
        registry.register("user_dir", user_dir)


def import_files(file_path: str, module_name: str = None):
    """Import all python files in the directory of ``file_path`` as
    submodules of ``module_name`` (reference env.py:100-116)."""
    for f in os.listdir(os.path.dirname(file_path)):
        if f.endswith(".py") and not f.startswith("_"):
            module = f[: f.find(".py")]
            if module_name:
                importlib.import_module(f"{module_name}.{module}")


def setup_imports():
    """Automatically load all of the modules so registration side effects
    happen (reference env.py:134-191)."""
    from mmf_tpu.common.registry import registry

    # Check if imports are already setup
    has_already_setup = registry.get("imports_setup", no_warning=True)
    if has_already_setup:
        return

    root_folder = os.path.dirname(os.path.abspath(__file__))
    root_folder = os.path.dirname(root_folder)  # mmf_tpu/

    trainer_folder = os.path.join(root_folder, "trainers")
    trainer_pattern = os.path.join(trainer_folder, "**", "*.py")
    datasets_folder = os.path.join(root_folder, "datasets")
    datasets_pattern = os.path.join(datasets_folder, "**", "*.py")
    model_folder = os.path.join(root_folder, "models")
    model_pattern = os.path.join(model_folder, "**", "*.py")
    modules_folder = os.path.join(root_folder, "modules")
    modules_pattern = os.path.join(modules_folder, "**", "*.py")
    common_folder = os.path.join(root_folder, "common")
    common_pattern = os.path.join(common_folder, "**", "*.py")

    files = (
        glob.glob(datasets_pattern, recursive=True)
        + glob.glob(model_pattern, recursive=True)
        + glob.glob(trainer_pattern, recursive=True)
        + glob.glob(modules_pattern, recursive=True)
        + glob.glob(common_pattern, recursive=True)
    )

    for f in files:
        f = os.path.realpath(f)
        if f.endswith(".py") and not f.endswith("__init__.py"):
            splits = f.split(os.sep)
            import_prefix_index = 0
            for idx, split in enumerate(splits):
                if split == "mmf_tpu":
                    import_prefix_index = idx + 1
            module_name = ".".join(["mmf_tpu"] + splits[import_prefix_index:])[:-3]
            importlib.import_module(module_name)

    registry.register("imports_setup", True)


def teardown_imports():
    """Re-entrancy for tests (analog of reference env.py:204): clears the
    setup/user-dir caches AND evicts imported user-plugin modules from
    sys.modules so the next import_user_module re-runs registrations."""
    from mmf_tpu.common.registry import registry

    imported = registry.get("__mmf_user_dir_imported__", no_warning=True)
    if isinstance(imported, set):
        basenames = {os.path.split(p)[1] for p in imported}
        for k in [
            k for k in sys.modules
            if k in basenames
            or any(k.startswith(b + ".") for b in basenames)
        ]:
            del sys.modules[k]
    registry.unregister("imports_setup")
    registry.unregister("__mmf_user_dir_imported__")
    registry.unregister("user_dir")


def setup_compilation_cache(config=None, cache_dir=None):
    """Enable the persistent XLA compilation cache (env.compilation_cache_dir
    or an explicit path). First run compiles and writes executables to
    disk; subsequent runs — including serving cold starts, where a
    32-bucket warmup otherwise recompiles everything — reload them.
    No-op when unset. Returns the directory in effect (or None)."""
    if cache_dir is None and config is not None:
        cache_dir = (config.get("env") or {}).get("compilation_cache_dir")
    if not cache_dir:
        return None
    import jax

    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    # cache everything: BERT-scale executables are small and the default
    # 1s threshold would skip most eval/serving buckets
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    logger.info("XLA compilation cache at %s", cache_dir)
    return cache_dir


def setup_run_folder(config):
    """Derive log/report dirs under save_dir."""
    save_dir = config.env.save_dir
    log_dir = config.env.log_dir or os.path.join(save_dir, "logs")
    report_dir = config.env.report_dir or os.path.join(save_dir, "reports")
    os.makedirs(save_dir, exist_ok=True)
    os.makedirs(log_dir, exist_ok=True)
    return save_dir, log_dir, report_dir


def get_run_timestamp() -> str:
    return datetime.now().strftime("%Y_%m_%dT%H_%M_%S")
