"""Prediction processors (parity with
mmf/datasets/processors/prediction_processors.py)."""

from __future__ import annotations

import numpy as np

from mmf_tpu.common.registry import registry
from mmf_tpu.datasets.processors.processors import BatchProcessor


@registry.register_processor("prediction.argmax")
class ArgMaxPredictionProcessor(BatchProcessor):
    """Report argmax answers for a batch (reference
    prediction_processors.py:19-38)."""

    def __init__(self, config, *args, **kwargs):
        super().__init__(config, *args, **kwargs)

    def __call__(self, report):
        answers = np.asarray(report["scores"]).argmax(axis=1)
        predictions = []
        ids = report.get("id", report.get("question_id"))
        for idx, answer in enumerate(answers):
            predictions.append(
                {"id": int(np.asarray(ids[idx])), "answer": int(answer)}
            )
        return predictions
