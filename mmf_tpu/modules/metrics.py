"""Metric library (parity with mmf/modules/metrics.py).

Metrics run HOST-side over the accumulated eval report (numpy in, numpy
out) — the same contract as the reference (computed under no_grad over a
``combined_report``; metrics.py:75-182). Device work stays in the jitted
step; the eval loop gathers candidate fields to host (mirroring the
reference's ``use_cpu`` accumulation) before calling these.

``Metrics.required_params`` tells the trainer which report fields to
accumulate, and results are namespaced ``<type>/<dataset>/<metric>``.
"""

from __future__ import annotations

import collections.abc
import warnings
from typing import Any, Dict, List

import numpy as np

from mmf_tpu.common.registry import registry


def _to_np(x):
    return np.asarray(x)


class Metrics:
    """Wrapper initializing and applying the configured metric list."""

    def __init__(self, metric_list):
        if not isinstance(metric_list, collections.abc.Sequence) or isinstance(
            metric_list, str
        ):
            metric_list = [metric_list]
        self.metrics = self._init_metrics(metric_list)

    def _init_metrics(self, metric_list):
        metrics = {}
        self.required_params = {"dataset_name", "dataset_type"}
        for entry in metric_list:
            key, instance = self._build_one(entry, metrics)
            metrics[key] = instance
            self.required_params.update(instance.required_params)
        return metrics

    @staticmethod
    def _build_one(entry, existing):
        """One metric-list entry (plain string, or a mapping with
        type/key/params/datasets) -> (report key, metric instance)."""
        params, dataset_names = {}, []
        if isinstance(entry, str):
            metric_type = key = entry
        elif isinstance(entry, collections.abc.Mapping):
            if "type" not in entry:
                raise ValueError(
                    f"Metric config {entry} carries no 'type' key"
                )
            metric_type = entry["type"]
            key = entry.get("key", metric_type)
            params = entry.get("params", {})
            dataset_names = entry.get("datasets", [])
            if key in existing:
                raise RuntimeError(
                    f"Duplicate metric key '{key}' in the metric list"
                )
        else:
            raise TypeError(
                f"Metric entry must be a str or mapping, got "
                f"{type(entry).__name__}"
            )
        cls = registry.get_metric_class(metric_type)
        if cls is None:
            raise ValueError(
                f"Unknown metric '{metric_type}': nothing registered "
                "under that key"
            )
        instance = cls(**params)
        instance.name = key
        instance.set_applicable_datasets(dataset_names)
        return key, instance

    def __call__(self, sample_list, model_output=None, *args, **kwargs):
        if model_output is None:
            model_output = sample_list  # combined report carries both
        values = {}
        dataset_type = _meta(sample_list, "dataset_type")
        dataset_name = _meta(sample_list, "dataset_name")

        for metric_name, metric_object in self.metrics.items():
            if not metric_object.is_dataset_applicable(dataset_name):
                continue
            metric_result = metric_object._calculate_with_checks(
                sample_list, model_output, *args, **kwargs
            )
            if not isinstance(metric_result, collections.abc.Mapping):
                metric_result = {"": metric_result}
            for child_name, child_result in metric_result.items():
                key = f"{dataset_type}/{dataset_name}/{metric_name}"
                key = f"{key}/{child_name}" if child_name else key
                values[key] = np.asarray(child_result, dtype=np.float32)

        registry.register(
            f"metrics.{dataset_name}.{dataset_type}", values
        )
        return values


def _meta(sample_list, key):
    val = sample_list.get(key, None) if hasattr(sample_list, "get") else None
    if isinstance(val, list):
        return val[0] if val else "unknown"
    return val if val is not None else (
        "train" if key == "dataset_type" else "unknown"
    )


class BaseMetric:
    """Base for registered metrics; subclasses implement ``calculate``
    (reference metrics.py:205-240)."""

    def __init__(self, name, *args, **kwargs):
        self.name = name
        self.required_params = ["scores", "targets"]
        self._dataset_names = set()

    def calculate(self, sample_list, model_output, *args, **kwargs):
        raise NotImplementedError

    def __call__(self, *args, **kwargs):
        return self.calculate(*args, **kwargs)

    def _calculate_with_checks(self, *args, **kwargs):
        return self.calculate(*args, **kwargs)

    def set_applicable_datasets(self, dataset_names):
        self._dataset_names = set(dataset_names)

    def is_dataset_applicable(self, dataset_name):
        return len(self._dataset_names) == 0 or dataset_name in self._dataset_names


def _convert_to_one_hot(expected, n_classes):
    expected = np.asarray(expected)
    if expected.ndim == 1 or (expected.ndim == 2 and expected.shape[1] == 1):
        idx = expected.reshape(-1).astype(np.int64)
        one_hot = np.zeros((idx.shape[0], n_classes), dtype=np.int64)
        one_hot[np.arange(idx.shape[0]), idx] = 1
        return one_hot
    return expected


# ---------------------------------------------------------------------------
@registry.register_metric("accuracy")
class Accuracy(BaseMetric):
    """**Key:** ``accuracy`` (reference metrics.py:243)."""

    def __init__(self, score_key="scores", target_key="targets", topk=1):
        super().__init__("accuracy")
        self.score_key = score_key
        self.target_key = target_key
        self.topk = topk

    def calculate(self, sample_list, model_output, *args, **kwargs):
        output = _to_np(model_output[self.score_key])
        expected = _to_np(sample_list[self.target_key])
        batch_size = output.shape[0]
        assert output.ndim <= 2 and expected.ndim <= 2

        if output.ndim == 2:
            top = np.argsort(-output, axis=1)[:, : self.topk].T.squeeze()
        else:
            top = output
        if expected.ndim == 2 and expected.shape[-1] != 1:
            expected = np.argsort(-expected, axis=1)[:, : self.topk].T.squeeze()
        correct = float(np.sum(expected == np.squeeze(top)))
        return correct / batch_size


@registry.register_metric("topk_accuracy")
class TopKAccuracy(Accuracy):
    def __init__(self, score_key: str, k: int):
        super().__init__(score_key=score_key, topk=k)


@registry.register_metric("vqa_accuracy")
class VQAAccuracy(BaseMetric):
    """Soft VQA accuracy: argmax over UNK-masked softmax scored against the
    soft target vector (reference metrics.py:355)."""

    def __init__(self):
        super().__init__("vqa_accuracy")

    def _masked_unk_softmax(self, x, axis, mask_idx):
        x = x - x.max(axis=axis, keepdims=True)
        ex = np.exp(x)
        x1 = ex / ex.sum(axis=axis, keepdims=True)
        x1[:, mask_idx] = 0
        return x1 / x1.sum(axis=1, keepdims=True)

    def calculate(self, sample_list, model_output, *args, **kwargs):
        output = _to_np(model_output["scores"]).astype(np.float64)
        if output.ndim == 3:  # three-branch movie+mcan
            output = output[:, 0]
        expected = _to_np(sample_list["targets"])
        output = self._masked_unk_softmax(output, 1, 0)
        pred = output.argmax(axis=1)
        scores = expected[np.arange(expected.shape[0]), pred]
        return float(np.sum(scores)) / expected.shape[0]


@registry.register_metric("vqa_evalai_accuracy")
class VQAEvalAIAccuracy(BaseMetric):
    """EvalAI-style accuracy over raw answer strings
    (reference metrics.py:404)."""

    def __init__(self):
        super().__init__("vqa_evalai_accuracy")
        from mmf_tpu.utils.m4c_evaluators import EvalAIAnswerProcessor

        self.evalai_answer_processor = EvalAIAnswerProcessor()
        self.required_params = ["scores", "answers", "context_tokens"]

    def _masked_unk_softmax(self, x, axis, mask_idx):
        x = x - x.max(axis=axis, keepdims=True)
        ex = np.exp(x)
        x1 = ex / ex.sum(axis=axis, keepdims=True)
        x1[:, mask_idx] = 0
        return x1 / x1.sum(axis=1, keepdims=True)

    def calculate(self, sample_list, model_output, *args, **kwargs):
        output = self._masked_unk_softmax(
            _to_np(model_output["scores"]).astype(np.float64), 1, 0
        )
        pred = output.argmax(axis=1)
        dataset_name = _meta(sample_list, "dataset_name")
        answer_processor = registry.get(dataset_name + "_answer_processor")
        answer_space = answer_processor.answer_vocab.word_list

        accuracy = []
        expected = sample_list["answers"]
        for idx, answer_id in enumerate(pred):
            answer = answer_space[int(answer_id)]
            if answer == "<unk>":
                answer = ""
            answer = self.evalai_answer_processor(answer)
            gt_answers = [
                self.evalai_answer_processor(x) for x in expected[idx]
            ]
            gt_answers = list(enumerate(gt_answers))
            gt_acc = []
            for gt_answer in gt_answers:
                other = [item for item in gt_answers if item != gt_answer]
                matching = [item for item in other if item[1] == answer]
                gt_acc.append(min(1, float(len(matching)) / 3))
            accuracy.append(float(sum(gt_acc)) / len(gt_acc))
        return float(sum(accuracy)) / max(len(accuracy), 1)


class RecallAtK(BaseMetric):
    """Visual-dialog style ranks over 100 options
    (reference metrics.py:476-545)."""

    def __init__(self, name="recall@k"):
        super().__init__(name)

    def get_ranks(self, sample_list, model_output, *args, **kwargs):
        output = _to_np(model_output["scores"])
        expected = _to_np(sample_list["targets"])
        # rank of each option (1 = best)
        order = np.argsort(-output, axis=1)
        ranks = np.empty_like(order)
        rows = np.arange(output.shape[0])[:, None]
        ranks[rows, order] = np.arange(output.shape[1])[None, :]
        ranks = ranks + 1
        ans_ind = expected.argmax(axis=1)
        gt_ranks = ranks[np.arange(ranks.shape[0]), ans_ind].astype(np.float64)
        return gt_ranks

    def calculate(self, sample_list, model_output, k, *args, **kwargs):
        ranks = self.get_ranks(sample_list, model_output)
        return float(np.sum(ranks <= k)) / ranks.shape[0]


@registry.register_metric("r@1")
class RecallAt1(RecallAtK):
    def __init__(self):
        super().__init__("r@1")

    def calculate(self, sample_list, model_output, *args, **kwargs):
        return super().calculate(sample_list, model_output, k=1)


@registry.register_metric("r@5")
class RecallAt5(RecallAtK):
    def __init__(self):
        super().__init__("r@5")

    def calculate(self, sample_list, model_output, *args, **kwargs):
        return super().calculate(sample_list, model_output, k=5)


@registry.register_metric("r@10")
class RecallAt10(RecallAtK):
    def __init__(self):
        super().__init__("r@10")

    def calculate(self, sample_list, model_output, *args, **kwargs):
        return super().calculate(sample_list, model_output, k=10)


@registry.register_metric("mean_r")
class MeanRank(RecallAtK):
    def __init__(self):
        super().__init__("mean_r")

    def calculate(self, sample_list, model_output, *args, **kwargs):
        return float(np.mean(self.get_ranks(sample_list, model_output)))


@registry.register_metric("mean_rr")
class MeanReciprocalRank(RecallAtK):
    def __init__(self):
        super().__init__("mean_rr")

    def calculate(self, sample_list, model_output, *args, **kwargs):
        return float(np.mean(1.0 / self.get_ranks(sample_list, model_output)))


# --- M4C-family text metrics -----------------------------------------------
@registry.register_metric("textvqa_accuracy")
class TextVQAAccuracy(BaseMetric):
    """Decode predicted token ids (vocab + OCR-copy) into an answer string
    and score with the TextVQA evaluator (reference metrics.py:669)."""

    def __init__(self):
        super().__init__("textvqa_accuracy")
        from mmf_tpu.utils import m4c_evaluators as evaluators

        self.evaluator = evaluators.TextVQAAccuracyEvaluator()
        self.required_params = ["scores", "answers", "context_tokens"]
        self.gt_key = "answers"

    def calculate(self, sample_list, model_output, *args, **kwargs):
        from mmf_tpu.utils.text import word_tokenize

        dataset_name = _meta(sample_list, "dataset_name")
        answer_processor = registry.get(dataset_name + "_answer_processor")

        scores = _to_np(model_output["scores"])
        pred_answers = scores.argmax(axis=-1)
        context_tokens = sample_list["context_tokens"]
        answers = sample_list[self.gt_key]
        answer_space_size = answer_processor.get_true_vocab_size()

        predictions = []
        for idx in range(len(pred_answers)):
            tokens = context_tokens[idx]
            answer_words = []
            for answer_id in pred_answers[idx].tolist():
                answer_id = int(answer_id)
                if answer_id >= answer_space_size:
                    answer_id -= answer_space_size
                    if answer_id < len(tokens):
                        answer_words.append(word_tokenize(tokens[answer_id]))
                else:
                    if answer_id == answer_processor.EOS_IDX:
                        break
                    answer_words.append(
                        answer_processor.answer_vocab.idx2word(answer_id)
                    )
            pred_answer = " ".join(answer_words).replace(" 's", "'s")
            gt_answers = answers[idx]
            predictions.append(
                {"pred_answer": pred_answer, "gt_answers": gt_answers}
            )
        return float(self.evaluator.eval_pred_list(predictions))


@registry.register_metric("stvqa_anls")
class STVQAANLS(TextVQAAccuracy):
    def __init__(self):
        super().__init__()
        self.name = "stvqa_anls"
        from mmf_tpu.utils import m4c_evaluators as evaluators

        self.evaluator = evaluators.STVQAANLSEvaluator()


@registry.register_metric("stvqa_accuracy")
class STVQAAccuracy(TextVQAAccuracy):
    def __init__(self):
        super().__init__()
        self.name = "stvqa_accuracy"
        from mmf_tpu.utils import m4c_evaluators as evaluators

        self.evaluator = evaluators.STVQAAccuracyEvaluator()


@registry.register_metric("ocrvqa_accuracy")
class OCRVQAAccuracy(STVQAAccuracy):
    def __init__(self):
        super().__init__()
        self.name = "ocrvqa_accuracy"


@registry.register_metric("textcaps_bleu4")
class TextCapsBleu4(TextVQAAccuracy):
    def __init__(self):
        super().__init__()
        self.name = "textcaps_bleu4"
        self.required_params = ["scores", "ref_strs", "context_tokens"]
        self.gt_key = "ref_strs"
        from mmf_tpu.utils import m4c_evaluators as evaluators

        self.evaluator = evaluators.TextCapsBleu4Evaluator()


@registry.register_metric("caption_bleu4")
class CaptionBleu4Metric(BaseMetric):
    """Corpus BLEU-4 over decoded captions (reference metrics.py:297)."""

    def __init__(self):
        super().__init__("caption_bleu4")
        import nltk.translate.bleu_score as bleu_score

        self._bleu_score = bleu_score
        self.caption_processor = registry.get("coco_caption_processor")
        self.required_params = ["scores", "answers", "captions"]

    def calculate(self, sample_list, model_output, *args, **kwargs):
        references = []
        hypotheses = []
        targets = sample_list["answers"]
        for j in range(len(targets)):
            img_captions = [
                self.caption_processor(c)["tokens"]
                for c in np.asarray(targets[j]).tolist()
            ]
            references.append(img_captions)

        if "captions" in model_output:
            scores = _to_np(model_output["captions"])
        else:
            scores = _to_np(model_output["scores"]).argmax(axis=-1)
        for j in range(len(scores)):
            hypotheses.append(self.caption_processor(scores[j].tolist())["tokens"])

        assert len(references) == len(hypotheses)
        return float(self._bleu_score.corpus_bleu(references, hypotheses))


# --- sklearn-backed families ------------------------------------------------
class _SklearnMetric(BaseMetric):
    def __init__(self, name, multilabel=False, **kwargs):
        super().__init__(name)
        self._multilabel = multilabel
        self._sk_kwargs = kwargs

    def _prepare(self, sample_list, model_output):
        scores = _to_np(model_output["scores"])
        expected = _to_np(sample_list["targets"])
        if self._multilabel:
            output = np.round(1.0 / (1.0 + np.exp(-scores)))
            expected = _convert_to_one_hot(expected, scores.shape[-1])
        else:
            output = scores.argmax(axis=-1)
            if expected.ndim != 1:
                expected = expected.argmax(axis=-1)
        return expected, output


@registry.register_metric("f1")
class F1(_SklearnMetric):
    def __init__(self, *args, **kwargs):
        multilabel = kwargs.pop("multilabel", False)
        super().__init__("f1", multilabel=multilabel, **kwargs)

    def calculate(self, sample_list, model_output, *args, **kwargs):
        from sklearn.metrics import f1_score

        expected, output = self._prepare(sample_list, model_output)
        return float(np.mean(f1_score(expected, output, **self._sk_kwargs)))


@registry.register_metric("macro_f1")
class MacroF1(F1):
    def __init__(self, *args, **kwargs):
        super().__init__(average="macro", **kwargs)
        self.name = "macro_f1"


@registry.register_metric("micro_f1")
class MicroF1(F1):
    def __init__(self, *args, **kwargs):
        super().__init__(average="micro", **kwargs)
        self.name = "micro_f1"


@registry.register_metric("binary_f1")
class BinaryF1(F1):
    def __init__(self, *args, **kwargs):
        super().__init__(average="binary", **kwargs)
        self.name = "binary_f1"


@registry.register_metric("multilabel_f1")
class MultiLabelF1(F1):
    def __init__(self, *args, **kwargs):
        super().__init__(multilabel=True, average=None, **kwargs)
        self.name = "multilabel_f1"


@registry.register_metric("multilabel_micro_f1")
class MultiLabelMicroF1(MultiLabelF1):
    def __init__(self, *args, **kwargs):
        kwargs.pop("average", None)
        super().__init__(**kwargs)
        self._sk_kwargs["average"] = "micro"
        self.name = "multilabel_micro_f1"


@registry.register_metric("multilabel_macro_f1")
class MultiLabelMacroF1(MultiLabelF1):
    def __init__(self, *args, **kwargs):
        kwargs.pop("average", None)
        super().__init__(**kwargs)
        self._sk_kwargs["average"] = "macro"
        self.name = "multilabel_macro_f1"


@registry.register_metric("f1_precision_recall")
class F1PrecisionRecall(_SklearnMetric):
    """Returns dict {f1, precision, recall} (reference metrics.py:871)."""

    def __init__(self, *args, **kwargs):
        multilabel = kwargs.pop("multilabel", False)
        super().__init__("f1_precision_recall", multilabel=multilabel, **kwargs)

    def calculate(self, sample_list, model_output, *args, **kwargs):
        from sklearn.metrics import precision_recall_fscore_support

        expected, output = self._prepare(sample_list, model_output)
        p, r, f, _ = precision_recall_fscore_support(
            expected, output, **self._sk_kwargs
        )
        return {
            "precision": np.float32(np.mean(p)),
            "recall": np.float32(np.mean(r)),
            "f1": np.float32(np.mean(f)),
        }


@registry.register_metric("binary_f1_precision_recall")
class BinaryF1PrecisionRecall(F1PrecisionRecall):
    def __init__(self, *args, **kwargs):
        super().__init__(average="binary", **kwargs)
        self.name = "binary_f1_precision_recall"


@registry.register_metric("macro_f1_precision_recall")
class MacroF1PrecisionRecall(F1PrecisionRecall):
    def __init__(self, *args, **kwargs):
        super().__init__(average="macro", **kwargs)
        self.name = "macro_f1_precision_recall"


@registry.register_metric("micro_f1_precision_recall")
class MicroF1PrecisionRecall(F1PrecisionRecall):
    def __init__(self, *args, **kwargs):
        super().__init__(average="micro", **kwargs)
        self.name = "micro_f1_precision_recall"


@registry.register_metric("roc_auc")
class ROC_AUC(BaseMetric):
    """ROC AUC over softmaxed scores (reference metrics.py:960).
    Requires full-split accumulation."""

    def __init__(self, *args, **kwargs):
        super().__init__("roc_auc")
        self._sk_kwargs = kwargs

    def calculate(self, sample_list, model_output, *args, **kwargs):
        from sklearn.metrics import roc_auc_score

        scores = _to_np(model_output["scores"]).astype(np.float64)
        scores = np.exp(scores - scores.max(-1, keepdims=True))
        output = scores / scores.sum(-1, keepdims=True)
        expected = _convert_to_one_hot(
            _to_np(sample_list["targets"]), output.shape[-1]
        )
        return float(roc_auc_score(expected, output, **self._sk_kwargs))


@registry.register_metric("micro_roc_auc")
class MicroROC_AUC(ROC_AUC):
    def __init__(self, *args, **kwargs):
        super().__init__(average="micro", **kwargs)
        self.name = "micro_roc_auc"


@registry.register_metric("macro_roc_auc")
class MacroROC_AUC(ROC_AUC):
    def __init__(self, *args, **kwargs):
        super().__init__(average="macro", **kwargs)
        self.name = "macro_roc_auc"


@registry.register_metric("ap")
class AveragePrecision(BaseMetric):
    def __init__(self, *args, **kwargs):
        super().__init__("ap")
        self._sk_kwargs = kwargs

    def calculate(self, sample_list, model_output, *args, **kwargs):
        from sklearn.metrics import average_precision_score

        scores = _to_np(model_output["scores"]).astype(np.float64)
        scores = np.exp(scores - scores.max(-1, keepdims=True))
        output = scores / scores.sum(-1, keepdims=True)
        expected = _convert_to_one_hot(
            _to_np(sample_list["targets"]), output.shape[-1]
        )
        return float(
            average_precision_score(expected, output, **self._sk_kwargs)
        )


@registry.register_metric("binary_ap")
class BinaryAP(AveragePrecision):
    """AP on positive-class probability (reference metrics.py:1041)."""

    def __init__(self, *args, **kwargs):
        super().__init__(**kwargs)
        self.name = "binary_ap"

    def calculate(self, sample_list, model_output, *args, **kwargs):
        from sklearn.metrics import average_precision_score

        scores = _to_np(model_output["scores"]).astype(np.float64)
        scores = np.exp(scores - scores.max(-1, keepdims=True))
        output = (scores / scores.sum(-1, keepdims=True))[:, 1]
        expected = _to_np(sample_list["targets"])
        if expected.ndim == 2:
            expected = expected.argmax(axis=1)
        return float(average_precision_score(expected, output, **self._sk_kwargs))


@registry.register_metric("micro_ap")
class MicroAP(AveragePrecision):
    def __init__(self, *args, **kwargs):
        super().__init__(average="micro", **kwargs)
        self.name = "micro_ap"


@registry.register_metric("macro_ap")
class MacroAP(AveragePrecision):
    def __init__(self, *args, **kwargs):
        super().__init__(average="macro", **kwargs)
        self.name = "macro_ap"


@registry.register_metric("r@pk")
class RecallAtPrecisionK(BaseMetric):
    """Recall at the best operating point with precision >= threshold
    (reference metrics.py:1118)."""

    def __init__(self, p_threshold, *args, **kwargs):
        super().__init__("r@pk")
        self.name = "r@pk"
        self.p_threshold = p_threshold if p_threshold < 1 else p_threshold / 100

    def calculate(self, sample_list, model_output, *args, **kwargs):
        from sklearn.metrics import precision_recall_curve

        scores = _to_np(model_output["scores"]).astype(np.float64)
        scores = np.exp(scores - scores.max(-1, keepdims=True))
        output = (scores / scores.sum(-1, keepdims=True))[:, 1]
        expected = _to_np(sample_list["targets"])
        if expected.ndim == 2:
            expected = expected.argmax(axis=1)
        precision, recall, _ = precision_recall_curve(expected, output)
        try:
            value, _ = max(
                (r, p)
                for p, r in zip(precision, recall)
                if p >= self.p_threshold
            )
        except ValueError:
            value = 0
        return float(value)


# --- retrieval recalls (alignment models) -----------------------------------
@registry.register_metric("r@k_retrieval")
class RecallAtK_ret(BaseMetric):
    """Image<->text retrieval recalls over embedding correlations
    (reference metrics.py:1171)."""

    def __init__(self, name="recall@k"):
        super().__init__(name)

    def _get_RatK_multi(self, correlations, labels, k, factor):
        top_k_ids = np.argsort(-correlations, axis=1)[:, :k]
        hits = (
            (labels[:, None] <= top_k_ids)
            & (top_k_ids < labels[:, None] + factor)
        ).max(axis=1)
        return hits

    def calculate(self, sample_list, model_output, k, flip=False, *args,
                  **kwargs):
        image_embeddings = _to_np(model_output["scores"])
        text_embeddings = _to_np(model_output["targets"])
        correlations = image_embeddings @ text_embeddings.T
        assert correlations.shape[1] % correlations.shape[0] == 0
        batch_size = correlations.shape[0]
        factor = correlations.shape[1] // correlations.shape[0]
        labels = np.arange(batch_size) * factor
        if flip:
            correlations = correlations.T
            labels = np.repeat(np.arange(batch_size), factor)
            factor = 1
        hits = self._get_RatK_multi(correlations, labels, k, factor)
        return float(hits.sum()) / hits.shape[0]


@registry.register_metric("r@1_retrieval")
class RecallAt1_ret(RecallAtK_ret):
    def __init__(self):
        super().__init__("r@1")

    def calculate(self, sample_list, model_output, *args, **kwargs):
        return super().calculate(sample_list, model_output, 1)


@registry.register_metric("r@1_rev_retrieval")
class RecallAt1_rev_ret(RecallAtK_ret):
    def __init__(self):
        super().__init__("r@1_rev")

    def calculate(self, sample_list, model_output, *args, **kwargs):
        return super().calculate(sample_list, model_output, 1, flip=True)


@registry.register_metric("r@5_retrieval")
class RecallAt5_ret(RecallAtK_ret):
    def __init__(self):
        super().__init__("r@5")

    def calculate(self, sample_list, model_output, *args, **kwargs):
        return super().calculate(sample_list, model_output, 5)


@registry.register_metric("r@5_rev_retrieval")
class RecallAt5_rev_ret(RecallAtK_ret):
    def __init__(self):
        super().__init__("r@5_rev")

    def calculate(self, sample_list, model_output, *args, **kwargs):
        return super().calculate(sample_list, model_output, 5, flip=True)


@registry.register_metric("r@10_retrieval")
class RecallAt10_ret(RecallAtK_ret):
    def __init__(self):
        super().__init__("r@10")

    def calculate(self, sample_list, model_output, *args, **kwargs):
        return super().calculate(sample_list, model_output, 10)


@registry.register_metric("r@10_rev_retrieval")
class RecallAt10_rev_ret(RecallAtK_ret):
    def __init__(self):
        super().__init__("r@10_rev")

    def calculate(self, sample_list, model_output, *args, **kwargs):
        return super().calculate(sample_list, model_output, 10, flip=True)


@registry.register_metric("detection_mean_ap")
class DetectionMeanAP(BaseMetric):
    """COCO-style detection mAP (reference metrics.py:1315). Requires
    pycocotools, which is optional; raises a clear error if absent."""

    def __init__(self, dataset_json_files=None, *args, **kwargs):
        super().__init__("detection_mean_ap")
        self.required_params = ["__prediction_report__"]
        self.dataset_json_files = dataset_json_files

    def calculate(self, sample_list, model_output, execute_on_master_only=True,
                  *args, **kwargs):
        predictions = model_output["__prediction_report__"]
        dataset_name = _meta(sample_list, "dataset_name")
        dataset_type = _meta(sample_list, "dataset_type")
        gt_json = self.dataset_json_files[dataset_name][dataset_type]
        try:
            from pycocotools.coco import COCO  # noqa: F401
            from pycocotools.cocoeval import COCOeval
        except ImportError:
            # in-repo COCOeval-protocol implementation
            from mmf_tpu.utils.coco_eval import CocoBboxEvaluator

            return CocoBboxEvaluator(gt_json).evaluate(predictions)

        coco = COCO(gt_json)
        coco_dt = coco.loadRes(predictions)
        coco_eval = COCOeval(coco, coco_dt, "bbox")
        coco_eval.evaluate()
        coco_eval.accumulate()
        coco_eval.summarize()
        return float(coco_eval.stats[0])
