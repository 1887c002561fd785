"""Processor golden parity vs the torch reference: the soft VQA-accuracy
score construction, EvalAI answer normalization, and the transformer
bbox geometry features."""

import os

import numpy as np
import pytest

pytestmark = pytest.mark.skipif(
    not os.path.isdir("/root/reference/mmf"),
    reason="reference checkout not mounted",
)


@pytest.fixture(scope="module")
def ref():
    from tests.reference_parity import shims

    shims.install()
    import mmf.datasets.processors.processors as ref_processors
    import mmf.utils.m4c_evaluators as ref_evaluators

    yield {"processors": ref_processors, "evaluators": ref_evaluators}
    shims.uninstall()


@pytest.fixture(scope="module")
def answer_vocab(tmp_path_factory):
    vocab = tmp_path_factory.mktemp("vocab") / "answers.txt"
    vocab.write_text("\n".join(
        ["red", "blue", "green", "two", "cat", "yes", "no"]
    ))
    return str(vocab)


def _vqa_config(vocab_file):
    from mmf_tpu.config import omega

    return omega.create({
        "vocab_file": vocab_file,
        "num_answers": 10,
        "preprocessor": {"type": "simple_word", "params": {}},
    })


def test_vqa_answer_scores_match(ref, answer_vocab):
    from mmf_tpu.datasets.processors.processors import (
        VQAAnswerProcessor as Ours,
    )

    theirs = ref["processors"].VQAAnswerProcessor(_vqa_config(answer_vocab))
    ours = Ours(_vqa_config(answer_vocab))

    cases = [
        ["red"] * 10,                          # unanimous
        ["red"] * 4 + ["blue"] * 3 + ["cat"] * 3,  # split
        ["red", "blue", "green", "two", "cat",
         "yes", "no", "red", "blue", "green"],     # scattered
        ["purple"] * 10,                       # all out-of-vocab
        ["Red"] * 5 + ["RED!"] * 5,            # needs preprocessing
    ]
    for answers in cases:
        t_out = theirs({"answers": list(answers)})
        j_out = ours({"answers": list(answers)})
        np.testing.assert_allclose(
            np.asarray(j_out["answers_scores"], np.float32),
            t_out["answers_scores"].numpy(),
            atol=1e-6, err_msg=str(answers),
        )
        np.testing.assert_array_equal(
            np.asarray(j_out["answers_indices"]),
            t_out["answers_indices"].numpy(),
        )


def test_evalai_answer_normalization(ref):
    from mmf_tpu.utils.m4c_evaluators import EvalAIAnswerProcessor as Ours

    theirs = ref["evaluators"].EvalAIAnswerProcessor()
    ours = Ours()
    cases = [
        "It's a CAT!", "twenty-two", "2,300 people", "none", "don't know",
        "a    lot of  spaces", "1st place", "colour grey", "isnt it",
    ]
    for case in cases:
        assert ours(case) == theirs(case), case


def test_transformer_bbox_processor(ref):
    from mmf_tpu.config import omega
    from mmf_tpu.datasets.processors.processors import (
        TransformerBboxProcessor as Ours,
    )

    cfg = omega.create({
        "bbox_key": "bbox",
        "image_width_key": "image_width",
        "image_height_key": "image_height",
    })
    theirs = ref["processors"].TransformerBboxProcessor(cfg)
    ours = Ours(cfg)

    rng = np.random.RandomState(0)
    boxes = np.sort(rng.rand(6, 4).astype(np.float32) * 100, axis=-1)
    item = {
        "bbox": boxes,
        "image_width": 100,
        "image_height": 80,
    }
    # the reference calls torch.from_numpy on the bbox itself
    t_out = theirs({"bbox": boxes.copy(),
                    "image_width": 100, "image_height": 80})
    j_out = ours(dict(item, bbox=boxes.copy()))
    np.testing.assert_allclose(
        np.asarray(j_out["bbox"], np.float32), t_out["bbox"].numpy(),
        atol=1e-5,
    )
