"""Module-patching helpers (parity with mmf/utils/patch.py).

The reference monkeypatches transformers' module layout for backwards
compatibility (patch_transformers) and offers safecopy/restore. Modern
transformers needs no aliasing, so patch_transformers is a validated
no-op; safecopy/restore are kept for user plugins that rely on them."""

from __future__ import annotations

import importlib
import logging
import sys

logger = logging.getLogger(__name__)

ORIGINAL_PATCH_FUNCTIONS_KEY = "original_patch_functions"
_saved_modules = {}


def patch_transformers(log_incompatible=False):
    """No-op on transformers>=4.x layouts; kept for API parity."""
    try:
        import transformers  # noqa: F401
    except ImportError:
        if log_incompatible:
            logger.warning("transformers is not installed")
    return


def safecopy_modules(module_function_names, caller_modules):
    """Save current function implementations so they can be restored
    (reference patch.py:93-119)."""
    for name in module_function_names:
        module_name, fn_name = name.rsplit(".", 1)
        module = caller_modules.get(module_name, None)
        if module is None:
            continue
        fn = getattr(module, fn_name, None)
        if fn is not None:
            _saved_modules.setdefault(name, fn)


def restore_saved_modules(caller_modules):
    """(reference patch.py:120-139)"""
    for name, fn in _saved_modules.items():
        module_name, fn_name = name.rsplit(".", 1)
        module = caller_modules.get(module_name, None)
        if module is not None:
            setattr(module, fn_name, fn)
    _saved_modules.clear()
