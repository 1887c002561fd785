"""Shared compile-on-first-use machinery for the native host-side
kernels (editdist C, lmdb C++, phoc C).

One implementation of the cache-dir layout, staleness check, and
compiler fallback chain — each kernel module passes its source path and
a setup callback that declares ctypes signatures. Every caller keeps a
pure-python fallback so a missing compiler never breaks a run."""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
from typing import Callable, Optional, Sequence

logger = logging.getLogger(__name__)

_CACHE_DIR = os.path.join(
    os.path.expanduser("~"), ".cache", "mmf_tpu", "native"
)

_C_COMPILERS = ("cc", "gcc", "clang")
_CXX_COMPILERS = ("c++", "g++", "clang++")


def compile_lib(
    src: str,
    lib_name: str,
    setup: Callable[[ctypes.CDLL], None],
    cxx: bool = False,
    extra_flags: Sequence[str] = (),
) -> Optional[ctypes.CDLL]:
    """Compile ``src`` into ``~/.cache/mmf_tpu/native/<lib_name>.so``
    (recompiling when the source is newer), load it, run ``setup`` to
    declare signatures. Returns None when no compiler works — callers
    fall back to python."""
    os.makedirs(_CACHE_DIR, exist_ok=True)
    lib_path = os.path.join(_CACHE_DIR, f"lib{lib_name}.so")
    try:
        if not os.path.exists(lib_path) or os.path.getmtime(
            lib_path
        ) < os.path.getmtime(src):
            compilers = _CXX_COMPILERS if cxx else _C_COMPILERS
            for cc in compilers:
                try:
                    subprocess.check_call(
                        [cc, "-O2", "-shared", "-fPIC", "-o", lib_path, src,
                         *extra_flags],
                        stderr=subprocess.DEVNULL,
                    )
                    break
                except (subprocess.CalledProcessError, FileNotFoundError):
                    continue
            else:
                raise RuntimeError("no compiler found")
        lib = ctypes.CDLL(lib_path)
        setup(lib)
        return lib
    except Exception as e:  # pragma: no cover
        logger.warning(
            f"native {lib_name} unavailable ({e}); using python fallback"
        )
        return None
