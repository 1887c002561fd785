"""PathManager shim (parity with mmf/utils/file_io.py — fvcore/iopath
wrapper; plain filesystem here)."""

from __future__ import annotations

import os
import shutil


class PathManager:
    @staticmethod
    def open(path, mode="r", **kwargs):
        return open(path, mode, **kwargs)

    @staticmethod
    def exists(path) -> bool:
        return os.path.exists(path)

    @staticmethod
    def isfile(path) -> bool:
        return os.path.isfile(path)

    @staticmethod
    def isdir(path) -> bool:
        return os.path.isdir(path)

    @staticmethod
    def mkdirs(path):
        os.makedirs(path, exist_ok=True)

    @staticmethod
    def ls(path):
        return os.listdir(path)

    @staticmethod
    def rm(path):
        if os.path.isdir(path):
            shutil.rmtree(path)
        elif os.path.exists(path):
            os.remove(path)

    @staticmethod
    def copy(src, dst, **kwargs):
        return shutil.copy2(src, dst)

    @staticmethod
    def get_local_path(path):
        return path
