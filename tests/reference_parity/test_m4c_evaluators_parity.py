"""Golden parity of answer-string evaluators vs the PyTorch reference
(mmf/utils/m4c_evaluators.py): EvalAI normalization, TextVQA soft
accuracy, STVQA exact-match accuracy, and ANLS. These formulas decide the
reported benchmark numbers, so they must agree string-for-string.

BLEU-4 is excluded: the reference requires pycocoevalcap (absent from the
image); ours uses NLTK corpus BLEU — a documented deviation.
"""

import importlib.util
import sys

import pytest

from mmf_tpu.utils import m4c_evaluators as ours


@pytest.fixture(scope="module")
def ref():
    # m4c_evaluators is torch-free — load it directly, without triggering
    # mmf/__init__ (which would drag in the full reference install).
    spec = importlib.util.spec_from_file_location(
        "ref_m4c_evaluators", "/root/reference/mmf/utils/m4c_evaluators.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    yield mod
    sys.modules.pop("ref_m4c_evaluators", None)


TRICKY_STRINGS = [
    "The Quick, Brown Fox?",
    "it's a cat's toy",
    "TWO apples and one orange",
    "1,000,000 dollars",
    "3.50",
    "yes.",
    "a the an answer",
    "dont know",
    "semi;colon / slash - dash",
    "he said \"hello\" (loudly)",
    "y'alld've guessed",
    "somebody'd",
    "  whitespace   everywhere\t",
    "st. john's",
    "12.5 > 3",
    "oclock",
    "none",
    "q?!",
    "",
]


def test_evalai_normalization_parity(ref):
    r = ref.EvalAIAnswerProcessor()
    o = ours.EvalAIAnswerProcessor()
    for s in TRICKY_STRINGS:
        assert o(s) == r(s), f"normalization diverges on {s!r}"


def test_textvqa_soft_accuracy_parity(ref):
    gt = [
        "cat", "cat", "Cat", "a cat", "kitten",
        "dog", "cat", "the cat", "feline", "cat",
    ]
    preds = ["cat", "kitten", "dog", "giraffe", "a cat?"]
    for p in preds:
        pl = [{"pred_answer": p, "gt_answers": gt}]
        assert ours.TextVQAAccuracyEvaluator().eval_pred_list(pl) == pytest.approx(
            ref.TextVQAAccuracyEvaluator().eval_pred_list(pl)
        )


def test_stvqa_accuracy_parity(ref):
    pl = [
        {"pred_answer": "Main St.", "gt_answers": ["main st", "Main Street"]},
        {"pred_answer": "blue", "gt_answers": ["red", "green"]},
        {"pred_answer": "TWO", "gt_answers": ["2"]},
    ]
    assert ours.STVQAAccuracyEvaluator().eval_pred_list(pl) == pytest.approx(
        ref.STVQAAccuracyEvaluator().eval_pred_list(pl)
    )


def test_anls_parity(ref):
    # The reference needs the editdistance package; substitute our native
    # edit distance into its class so the *formula* is what's compared.
    r = ref.STVQAANLSEvaluator.__new__(ref.STVQAANLSEvaluator)
    r.get_edit_distance = ours.levenshtein
    pl = [
        {"pred_answer": "hello", "gt_answers": ["helo", "world"]},
        {"pred_answer": "exact", "gt_answers": ["exact"]},
        {"pred_answer": "abcdef", "gt_answers": ["uvwxyz"]},
        {"pred_answer": " PADDED ", "gt_answers": ["padded", "pad"]},
        {"pred_answer": "half match", "gt_answers": ["half m"]},
    ]
    assert ours.STVQAANLSEvaluator().eval_pred_list(pl) == pytest.approx(
        r.eval_pred_list(pl)
    )
