"""Shared type aliases (parity with mmf/common/typings.py)."""

from typing import Any, Dict, NamedTuple, Optional


DictConfig = Dict[str, Any]


class PerSetAttributeType(NamedTuple):
    train: Any
    val: Any
    test: Any


class ProcessorConfigType(NamedTuple):
    type: str
    params: Optional[Dict[str, Any]] = None
