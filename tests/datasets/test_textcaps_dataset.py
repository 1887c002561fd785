"""TextcapsDataset overrides (reference mmf/datasets/builders/textcaps/
dataset.py:12-41): dummy empty question, caption_id as question_id,
caption-as-answer routing, evalai entry reshaping."""

import numpy as np

from mmf_tpu.common.sample import Sample
from mmf_tpu.datasets.builders.textcaps.builder import TextcapsDataset
from mmf_tpu.datasets.builders.textvqa.dataset import TextVQADataset
from mmf_tpu.utils.distributed import byte_tensor_to_object


def _bare_dataset():
    ds = TextcapsDataset.__new__(TextcapsDataset)
    ds.config = {}
    ds.dataset_type = "train"
    ds._index = 0
    return ds


def test_preprocess_blanks_question_and_maps_caption_id(monkeypatch):
    ds = _bare_dataset()
    monkeypatch.setattr(
        TextVQADataset, "preprocess_sample_info", lambda self, si: si
    )
    out = ds.preprocess_sample_info(
        {"question_str": "what is this", "question_id": 7,
         "caption_id": 42, "feature_path": "x.npy"}
    )
    assert out["question_str"] == ""
    assert out["question_id"] == 42


def test_postprocess_evalai_entry():
    ds = _bare_dataset()
    entry = ds.postprocess_evalai_entry(
        {"question_id": 9, "image_id": "im1", "answer": "a red bus",
         "pred_source": ["VOCAB"]}
    )
    assert entry == {"caption_id": 9, "image_id": "im1",
                     "caption": "a red bus", "pred_source": ["VOCAB"]}


def test_add_answer_info_routes_caption(monkeypatch):
    ds = _bare_dataset()
    seen = {}

    def fake_super(self, sample_info, sample):
        seen["answers"] = sample_info.get("answers")
        return sample

    monkeypatch.setattr(TextVQADataset, "add_answer_info", fake_super)
    sample = Sample()
    sample.answers = "placeholder"
    out = ds.add_answer_info(
        {"caption_str": "a red bus", "reference_strs": ["a red bus",
                                                        "red bus"]},
        sample,
    )
    # the single caption became THE answer list for the processor
    assert seen["answers"] == ["a red bus"]
    # caption/ref strings are carried as byte tensors; answers dropped
    assert byte_tensor_to_object(out.caption_str) == "a red bus"
    assert byte_tensor_to_object(out.ref_strs) == ["a red bus", "red bus"]
    assert "answers" not in out
