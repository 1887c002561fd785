"""M4C-Captioner (parity with mmf/models/m4c_captioner.py:23): the M4C
trunk with ``remove_unk_in_pred`` — <unk> logits are masked to -1e10 in
EVERY output step, so the greedy feedback chain never emits <unk>
(reference _forward_output:16-23). The empty question comes from the
textcaps dataset (dummy "" question_str), not from the model."""

from __future__ import annotations

from typing import Any

from mmf_tpu.common.registry import registry
from mmf_tpu.models.m4c import M4C


@registry.register_model("m4c_captioner")
class M4CCaptioner(M4C):
    config: Any = None

    @classmethod
    def config_path(cls):
        return "configs/models/m4c_captioner/defaults.yaml"

    def _unk_idx(self):
        if "unk_idx" in self.config:
            return int(self.config["unk_idx"])
        datasets = self.config.get("datasets", None) or (
            registry.get("config", no_warning=True) or {}
        ).get("datasets", None)
        if isinstance(datasets, str):
            dataset = datasets.split(",")[0].strip()
        elif isinstance(datasets, (list, tuple)) and datasets:
            dataset = datasets[0]
        else:
            dataset = "textcaps"
        ap = registry.get(f"{dataset}_answer_processor", no_warning=True)
        return getattr(ap, "UNK_IDX", None)

    def _finalize_scores(self, scores):
        if not self.config.get("remove_unk_in_pred", True):
            return scores
        unk = self._unk_idx()
        if unk is None:
            return scores
        return scores.at[..., unk].set(-1e10)
