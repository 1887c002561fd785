"""PHOC featurizer: word -> 604-dim float vector.

Loads the native C implementation (src/phoc.c) through ctypes, compiling it
on first use into a cached shared library; falls back to an equivalent
pure-python implementation if no C compiler is available. Host-side
preprocessing — output feeds jit pipelines as a constant-shape [604]
feature (used by PhocProcessor for M4C's OCR encoding).
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
import tempfile
from typing import List, Optional

import numpy as np

logger = logging.getLogger(__name__)

PHOC_DIM = 604
_SRC = os.path.join(os.path.dirname(os.path.abspath(__file__)), "src", "phoc.c")
_LIB: Optional[ctypes.CDLL] = None
_LIB_FAILED = False

_UNIGRAMS = "abcdefghijklmnopqrstuvwxyz0123456789"
_BIGRAMS = [
    "th", "he", "in", "er", "an", "re", "es", "on", "st", "nt",
    "en", "at", "ed", "nd", "to", "or", "ea", "ti", "ar", "te",
    "ng", "al", "it", "as", "is", "ha", "et", "se", "ou", "of",
    "le", "sa", "ve", "ro", "ra", "ri", "hi", "ne", "me", "de",
    "co", "ta", "ec", "si", "ll", "so", "na", "li", "la", "el",
]


def _compile_lib() -> Optional[ctypes.CDLL]:
    """Compile+load via the shared native build helper
    (mmf_tpu/utils/native/build.py)."""
    global _LIB, _LIB_FAILED
    if _LIB is not None:
        return _LIB
    if _LIB_FAILED:
        return None
    from mmf_tpu.utils.native.build import compile_lib

    def _setup(lib):
        lib.phoc_build.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_float)
        ]
        lib.phoc_build.restype = ctypes.c_int
        lib.phoc_build_batch.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_int),
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_float),
        ]
        lib.phoc_build_batch.restype = ctypes.c_int

    lib = compile_lib(_SRC, "phoc", _setup)
    if lib is None:
        _LIB_FAILED = True
        return None
    _LIB = lib
    return lib

def _build_phoc_python(token: str) -> np.ndarray:
    """Pure-python PHOC (same construction as src/phoc.c)."""
    out = np.zeros(PHOC_DIM, np.float32)
    n = len(token)
    if n == 0:
        return out

    f32 = np.float32

    def occupies(occ0, occ1, region, level):
        # float32 arithmetic to match the C implementation exactly (the
        # 0.5 threshold sits on float32 rounding boundaries)
        occ0, occ1 = f32(occ0), f32(occ1)
        r0, r1 = f32(f32(region) / f32(level)), f32(f32(region + 1) / f32(level))
        o0, o1 = max(occ0, r0), min(occ1, r1)
        return f32(o1 - o0) / f32(occ1 - occ0) >= f32(0.5)

    for i, ch in enumerate(token):
        ci = _UNIGRAMS.find(ch)
        if ci < 0:
            raise ValueError(f"unigram {ch!r} is unknown")
        occ0, occ1 = i / n, (i + 1) / n
        level_offset = 0
        for level in range(2, 6):
            for region in range(level):
                if occupies(occ0, occ1, region, level):
                    out[(level_offset + region) * 36 + ci] = 1.0
            level_offset += level

    bigram_offset = 36 * 14
    for i in range(n - 1):
        pair = token[i:i + 2]
        if pair not in _BIGRAMS:
            continue
        bi = _BIGRAMS.index(pair)
        occ0, occ1 = i / n, (i + 2) / n
        for region in range(2):
            if occupies(occ0, occ1, region, 2):
                out[bigram_offset + region * 50 + bi] = 1.0
    return out


def build_phoc(token: str) -> np.ndarray:
    """Single-word PHOC; normalizes the token like the reference wrapper
    (lowercase, strip)."""
    token = token.lower().strip()
    # reference wrapper filters to the 36-char alphabet — spaces
    # and punctuation are DROPPED, not passed to the kernel (which
    # errors on unknown unigrams)
    token = "".join([c for c in token if c in _UNIGRAMS])
    lib = _compile_lib()
    if lib is None:
        return _build_phoc_python(token)
    out = np.zeros(PHOC_DIM, np.float32)
    rc = lib.phoc_build(
        token.encode("utf-8"),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    if rc != 0:
        return _build_phoc_python(token)
    return out


def build_phoc_batch(tokens: List[str]) -> np.ndarray:
    """Vectorized batch PHOC through one C call."""
    tokens = [
        "".join(c for c in t.lower().strip() if c in _UNIGRAMS)
        for t in tokens
    ]
    lib = _compile_lib()
    if lib is None:
        return np.stack([_build_phoc_python(t) for t in tokens])
    packed = b""
    offsets = np.zeros(len(tokens), np.int32)
    for i, t in enumerate(tokens):
        offsets[i] = len(packed)
        packed += t.encode("utf-8") + b"\x00"
    out = np.zeros((len(tokens), PHOC_DIM), np.float32)
    rc = lib.phoc_build_batch(
        packed,
        offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        len(tokens),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    if rc != 0:  # fall back rather than return partial/zero vectors
        return np.stack([_build_phoc_python(t) for t in tokens])
    return out
