"""Streaming (stateful) metrics — the reference's "torchmetrics" surface.

Parity with mmf/trainers/lightning_core/torchmetric.py:14-148
(``LightningTorchMetrics``): a container configured from
``evaluation.torchmetrics`` whose entries carry ``type``/``key``/``params``
and an optional ``datasets`` applicability list; each metric is a stateful
update/compute/reset object so results stream over batches without
accumulating the full eval report. Once torchmetrics are provided, the
regular report-level metrics are ignored for that run (same warning
semantics as the reference).

The reference registers no concrete torchmetric in-package (its
``top_k_accuracy`` appears only as the docstring example,
mmf/common/registry.py:196-205); we ship it for real so the surface is
usable out of the box. Scalars are logged as ``<type>_<key>`` — the key
format of loop_callback_with_torchmetrics.py:112.
"""

from __future__ import annotations

import collections.abc
import logging
from typing import Any, Dict, List, Sequence

import numpy as np

from mmf_tpu.common.registry import registry

logger = logging.getLogger("mmf_tpu")


class StreamingMetric:
    """Base class for registered streaming metrics.

    Subclasses implement ``update(sample_list, model_output)`` against
    host numpy arrays, ``compute() -> scalar-or-array`` and ``reset()``.
    """

    def update(self, sample_list, model_output) -> None:
        raise NotImplementedError

    def compute(self):
        raise NotImplementedError

    def reset(self) -> None:
        raise NotImplementedError


@registry.register_torchmetric("top_k_accuracy")
@registry.register_torchmetric("topk_accuracy")
class TopKAccuracy(StreamingMetric):
    """Fraction of samples whose true label lands in the top-k scores."""

    def __init__(self, k: int = 1, score_key: str = "scores",
                 target_key: str = "targets"):
        self.k = int(k)
        self.score_key = score_key
        self.target_key = target_key
        self.reset()

    def reset(self) -> None:
        self.correct = 0.0
        self.total = 0.0

    def update(self, sample_list, model_output) -> None:
        scores = np.asarray(model_output[self.score_key])
        targets = np.asarray(
            sample_list.get(self.target_key)
            if hasattr(sample_list, "get")
            else sample_list[self.target_key]
        )
        scores = scores.reshape(scores.shape[0], -1)
        if targets.ndim >= 2:  # one-/soft-hot -> index
            targets = targets.reshape(targets.shape[0], -1).argmax(axis=-1)
        k = min(self.k, scores.shape[-1])
        topk = np.argpartition(-scores, kth=k - 1, axis=-1)[:, :k]
        self.correct += float((topk == targets[:, None]).any(axis=-1).sum())
        self.total += float(scores.shape[0])

    def compute(self):
        return np.float32(self.correct / max(self.total, 1.0))


class StreamingMetrics:
    """Container over registered streaming metrics.

    Mirrors ``LightningTorchMetrics``: per-metric ``datasets``
    applicability, unique-key enforcement, ``update``/``compute``/
    ``reset`` fan-out and ``get_scalar_dict`` (non-scalar results are
    dropped from the scalar view, torchmetric.py:139-148).
    """

    def __init__(self, metric_list: Sequence):
        if not isinstance(metric_list, collections.abc.Sequence) or isinstance(
            metric_list, str
        ):
            metric_list = [metric_list]
        self.metrics: Dict[str, StreamingMetric] = {}
        self.metric_dataset_names: Dict[str, List[str]] = {}
        for metric in metric_list:
            params: Dict[str, Any] = {}
            dataset_names: List[str] = []
            if isinstance(metric, collections.abc.Mapping):
                if "type" not in metric:
                    raise ValueError(
                        f"Metric {metric} needs to have 'type' attribute "
                        "or should be a string"
                    )
                metric_type = key = metric["type"]
                params = dict(metric.get("params", {}) or {})
                if "key" in metric:
                    key = metric["key"]
                if key in self.metrics:
                    raise RuntimeError(
                        f"Metric with type/key '{metric_type}' has been "
                        "defined more than once in metric list."
                    )
                if "datasets" in metric:
                    dataset_names = list(metric["datasets"])
                else:
                    logger.warning(
                        f"metric '{key}' will be computed on all datasets "
                        "since datasets are not provided"
                    )
            else:
                if not isinstance(metric, str):
                    raise TypeError(
                        f"Metric {metric} has inappropriate type; "
                        "'dict' or 'str' allowed"
                    )
                metric_type = key = metric

            metric_cls = registry.get_torchmetric_class(metric_type)
            if metric_cls is None:
                raise ValueError(
                    f"No metric named {metric_type} registered to registry"
                )
            self.metrics[key] = metric_cls(**params)
            self.metric_dataset_names[key] = dataset_names

    @staticmethod
    def _is_dataset_applicable(dataset_name, metric_dataset_names) -> bool:
        return len(metric_dataset_names) == 0 or (
            dataset_name in metric_dataset_names
        )

    def update(self, sample_list, model_output, *args, **kwargs) -> None:
        dataset_name = None
        if hasattr(sample_list, "get"):
            dataset_name = sample_list.get("dataset_name", None)
        if isinstance(dataset_name, (list, tuple)):
            dataset_name = dataset_name[0] if dataset_name else None
        for name, metric in self.metrics.items():
            if not self._is_dataset_applicable(
                dataset_name, self.metric_dataset_names.get(name, [])
            ):
                continue
            metric.update(sample_list, model_output)

    def compute(self) -> Dict[str, Any]:
        return {name: m.compute() for name, m in self.metrics.items()}

    def reset(self) -> None:
        for m in self.metrics.values():
            m.reset()

    def get_scalar_dict(self) -> Dict[str, float]:
        out = {}
        for k, v in self.compute().items():
            arr = np.asarray(v).reshape(-1)
            if arr.size > 1:  # non-scalar results are ignored
                continue
            out[k] = float(arr[0])
        return out


# searchable alias matching the reference class name
LightningTorchMetrics = StreamingMetrics
