"""Tensor reshaping helpers used by VisualBERT
(parity with mmf/utils/transform.py)."""

from __future__ import annotations

import jax.numpy as jnp


def transform_to_batch_sequence(tensor):
    """(B, [n], S) -> (B*n, S)."""
    if tensor is None:
        return None
    if tensor.ndim == 2:
        return tensor
    assert tensor.ndim == 3
    return tensor.reshape(-1, tensor.shape[-1])


def transform_to_batch_sequence_dim(tensor):
    """(B, [n], S, D) -> (B*n, S, D)."""
    if tensor is None:
        return None
    if tensor.ndim == 3:
        return tensor
    assert tensor.ndim == 4
    return tensor.reshape(-1, tensor.shape[-2], tensor.shape[-1])
