"""ctypes loader for the edit-distance / ANLS C kernels (src/editdist.c),
with equivalent pure-python fallbacks. Used by utils/m4c_evaluators for
the TextVQA/ST-VQA answer metrics."""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
from typing import List, Optional

import numpy as np

logger = logging.getLogger(__name__)

_SRC = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "src", "editdist.c"
)
_LIB: Optional[ctypes.CDLL] = None
_LIB_FAILED = False


def _compile_lib():
    """Compile+load via the shared native build helper (build.py)."""
    global _LIB, _LIB_FAILED
    if _LIB is not None:
        return _LIB
    if _LIB_FAILED:
        return None
    from mmf_tpu.utils.native.build import compile_lib

    def _setup(lib):
        lib.edit_distance.argtypes = [ctypes.c_char_p, ctypes.c_char_p]
        lib.edit_distance.restype = ctypes.c_int
        lib.anls_best.argtypes = [
            ctypes.c_char_p,
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_int),
            ctypes.c_int,
        ]
        lib.anls_best.restype = ctypes.c_double
    lib = compile_lib(_SRC, "editdist", _setup)
    if lib is None:
        _LIB_FAILED = True
        return None
    _LIB = lib
    return lib

def _edit_distance_python(s1: str, s2: str) -> int:
    if len(s1) < len(s2):
        s1, s2 = s2, s1
    if not s2:
        return len(s1)
    prev = list(range(len(s2) + 1))
    for i, c1 in enumerate(s1):
        cur = [i + 1]
        for j, c2 in enumerate(s2):
            cur.append(min(prev[j + 1] + 1, cur[j] + 1, prev[j] + (c1 != c2)))
        prev = cur
    return prev[-1]


def edit_distance(s1: str, s2: str) -> int:
    lib = _compile_lib()
    # the C kernel is byte-level; multibyte text goes to the char-level
    # python DP so distances stay character distances
    if lib is None or not (s1.isascii() and s2.isascii()):
        return _edit_distance_python(s1, s2)
    return lib.edit_distance(s1.encode("utf-8"), s2.encode("utf-8"))


def anls_best(pred: str, gts: List[str]) -> float:
    """max over ground truths of thresholded normalized levenshtein
    similarity (the ANLS rule: similarities < 0.5 count as 0)."""
    lib = _compile_lib()
    if lib is None or not gts or not pred.isascii() \
            or not all(g.isascii() for g in gts):
        best = 0.0
        for gt in gts:
            mx = max(len(pred), len(gt))
            if mx == 0:
                continue
            sim = 1.0 - _edit_distance_python(pred, gt) / mx
            best = max(best, sim if sim >= 0.5 else 0.0)
        return best
    packed = b""
    offsets = np.zeros(len(gts), np.int32)
    for i, gt in enumerate(gts):
        offsets[i] = len(packed)
        packed += gt.encode("utf-8") + b"\x00"
    return lib.anls_best(
        pred.encode("utf-8"),
        packed,
        offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        len(gts),
    )
