"""Pooling strategies over encoded layer stacks
(parity with mmf/modules/poolers.py).

Each registered pooler takes the transformer's per-layer hidden states
(list of [B, S, H]) and returns a pooled [B, H*] representation.
"""

from __future__ import annotations

from typing import List

import jax.numpy as jnp

from mmf_tpu.common.registry import registry


class BasePooler:
    def __init__(self, params=None, **kwargs):
        self.params = params or {}
        self.params.update(kwargs)

    def __call__(self, encoded_layers: List[jnp.ndarray],
                 pad_mask: jnp.ndarray = None):
        raise NotImplementedError


def _masked_mean(x, pad_mask):
    if pad_mask is None:
        return x.mean(axis=1)
    m = pad_mask.astype(x.dtype)[..., None]
    return jnp.sum(x * m, axis=1) / jnp.maximum(jnp.sum(m, axis=1), 1.0)


@registry.register_pooler("average_concat_last_k")
class AverageConcatLastN(BasePooler):
    """Concat the last k layers along hidden, then mean over tokens
    (reference poolers.py:23)."""

    def __init__(self, k=4, tol=0.000001, **kwargs):
        super().__init__(**kwargs)
        self.num_layers = k
        self.tol = tol

    def __call__(self, encoded_layers, pad_mask=None):
        assert self.num_layers <= len(encoded_layers)
        encoder_avg = jnp.concatenate(encoded_layers[-self.num_layers:], axis=2)
        return _masked_mean(encoder_avg, pad_mask)


@registry.register_pooler("average_k_from_last")
class AverageKFromLast(BasePooler):
    """Mean over tokens of the k-th layer from the end
    (reference poolers.py:44)."""

    def __init__(self, k=2, tol=0.000001, **kwargs):
        super().__init__(**kwargs)
        self.k = k
        self.tol = tol

    def __call__(self, encoded_layers, pad_mask=None):
        assert self.k <= len(encoded_layers)
        encoder_avg = encoded_layers[-self.k]
        return _masked_mean(encoder_avg, pad_mask)


@registry.register_pooler("average_sum_last_k")
class AverageSumLastK(BasePooler):
    """Sum the last k layers, then mean over tokens (reference poolers.py:64)."""

    def __init__(self, k=4, tol=0.000001, **kwargs):
        super().__init__(**kwargs)
        self.k = k
        self.tol = tol

    def __call__(self, encoded_layers, pad_mask=None):
        assert self.k <= len(encoded_layers)
        encoder_avg = jnp.stack(encoded_layers[-self.k:], axis=0).sum(axis=0)
        return _masked_mean(encoder_avg, pad_mask)


@registry.register_pooler("identity")
class IdentityPooler(BasePooler):
    def __call__(self, encoded_layers, pad_mask=None):
        return encoded_layers


@registry.register_pooler("cls")
class ClsPooler(BasePooler):
    """First token of the last (or configured) layer (reference poolers.py:90)."""

    def __init__(self, dim=1, **kwargs):
        super().__init__(**kwargs)
        self.dim = dim
        self.cls_index = 0

    def __call__(self, encoded_layers, pad_mask=None):
        if isinstance(encoded_layers, (list, tuple)):
            encoded_layers = encoded_layers[-1]
        return encoded_layers[:, self.cls_index]


@registry.register_pooler("avg")
class MeanPooler(BasePooler):
    """Token-mean of the last layer (reference poolers.py:111)."""

    def __init__(self, dim=1, **kwargs):
        super().__init__(**kwargs)
        self.dim = dim

    def __call__(self, encoded_layers, pad_mask=None):
        if isinstance(encoded_layers, (list, tuple)):
            encoded_layers = encoded_layers[-1]
        return encoded_layers.mean(axis=self.dim)
