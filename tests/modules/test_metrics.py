import numpy as np
import pytest

from mmf_tpu.modules.metrics import Metrics
from mmf_tpu.common.registry import registry


def _report(scores, targets, **extra):
    d = {
        "scores": np.asarray(scores),
        "targets": np.asarray(targets),
        "dataset_name": "vqa2",
        "dataset_type": "val",
    }
    d.update(extra)
    return d


def test_accuracy():
    m = Metrics(["accuracy"])
    scores = [[0.1, 0.9], [0.8, 0.2], [0.3, 0.7], [0.6, 0.4]]
    targets = [1, 0, 0, 0]
    out = m(_report(scores, targets))
    np.testing.assert_allclose(out["val/vqa2/accuracy"], 0.75)


def test_vqa_accuracy_soft_scores():
    m = Metrics(["vqa_accuracy"])
    # 3 classes; class 0 is UNK (masked)
    scores = [[5.0, 1.0, 3.0], [0.0, 2.0, 1.0]]
    targets = [[0.0, 0.3, 0.9], [0.0, 0.6, 0.0]]
    out = m(_report(scores, targets))
    # argmax after UNK-mask: sample0 -> class2 (0.9), sample1 -> class1 (0.6)
    np.testing.assert_allclose(out["val/vqa2/vqa_accuracy"], (0.9 + 0.6) / 2)


def test_recall_at_k():
    m = Metrics(["r@1", "r@5", "mean_r", "mean_rr"])
    n_opts = 10
    rng = np.random.RandomState(0)
    scores = rng.randn(4, n_opts)
    targets = np.zeros((4, n_opts))
    best = scores.argmax(1)
    targets[np.arange(4), best] = 1  # gt is always rank 1
    out = m(_report(scores, targets))
    np.testing.assert_allclose(out["val/vqa2/r@1"], 1.0)
    np.testing.assert_allclose(out["val/vqa2/mean_r"], 1.0)
    np.testing.assert_allclose(out["val/vqa2/mean_rr"], 1.0)


def test_binary_f1_and_roc_auc():
    m = Metrics(["binary_f1", "roc_auc", "binary_ap"])
    scores = np.asarray([[0.0, 2.0], [2.0, 0.0], [0.0, 3.0], [3.0, 0.0]])
    targets = np.asarray([1, 0, 1, 0])
    out = m(_report(scores, targets))
    np.testing.assert_allclose(out["val/vqa2/binary_f1"], 1.0)
    np.testing.assert_allclose(out["val/vqa2/roc_auc"], 1.0)
    np.testing.assert_allclose(out["val/vqa2/binary_ap"], 1.0)


def test_f1_precision_recall_dict():
    m = Metrics([{"type": "binary_f1_precision_recall"}])
    scores = np.asarray([[0.0, 2.0], [2.0, 0.0], [0.0, 3.0], [3.0, 0.0]])
    targets = np.asarray([1, 0, 0, 0])
    out = m(_report(scores, targets))
    assert "val/vqa2/binary_f1_precision_recall/f1" in out
    assert "val/vqa2/binary_f1_precision_recall/precision" in out
    assert "val/vqa2/binary_f1_precision_recall/recall" in out


def test_retrieval_recalls():
    m = Metrics(["r@1_retrieval", "r@1_rev_retrieval"])
    emb = np.eye(4, 8) * 3
    out = m(_report(emb, emb))
    np.testing.assert_allclose(out["val/vqa2/r@1_retrieval"], 1.0)
    np.testing.assert_allclose(out["val/vqa2/r@1_rev_retrieval"], 1.0)


def test_required_params_union():
    m = Metrics(["accuracy", "vqa_evalai_accuracy"])
    assert "answers" in m.required_params
    assert "scores" in m.required_params
    assert "dataset_name" in m.required_params


def test_dataset_applicability():
    m = Metrics([{"type": "accuracy", "datasets": ["other_ds"]}])
    out = m(_report([[1.0, 0.0]], [0]))
    assert out == {}


def test_duplicate_key_raises():
    with pytest.raises(RuntimeError):
        Metrics([{"type": "accuracy"}, {"type": "accuracy"}])


def test_custom_key():
    m = Metrics([{"type": "accuracy", "key": "acc5", "params": {"topk": 1}}])
    out = m(_report([[1.0, 0.0]], [0]))
    assert "val/vqa2/acc5" in out


def test_rpk():
    m = Metrics([{"type": "r@pk", "params": {"p_threshold": 50}}])
    scores = np.asarray([[0.0, 2.0], [2.0, 0.0], [0.0, 3.0], [3.0, 0.0]])
    targets = np.asarray([1, 0, 1, 0])
    out = m(_report(scores, targets))
    np.testing.assert_allclose(out["val/vqa2/r@pk"], 1.0)


def test_anls_evaluator():
    from mmf_tpu.utils.m4c_evaluators import STVQAANLSEvaluator

    ev = STVQAANLSEvaluator()
    assert ev.get_anls("hello", "hello") == 1.0
    assert ev.get_anls("hello", "hallo") == pytest.approx(0.8)
    assert ev.get_anls("abc", "xyz") == 0.0


def test_textvqa_evaluator_soft_score():
    from mmf_tpu.utils.m4c_evaluators import TextVQAAccuracyEvaluator

    ev = TextVQAAccuracyEvaluator()
    preds = [{"pred_answer": "cat", "gt_answers": ["cat"] * 6 + ["dog"] * 4}]
    assert ev.eval_pred_list(preds) == 1.0
    preds = [{"pred_answer": "dog", "gt_answers": ["cat"] * 7 + ["dog"] * 3}]
    assert 0 < ev.eval_pred_list(preds) < 1.0
