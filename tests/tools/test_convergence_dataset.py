"""The convergence-demo dataset (tools/benchmarks/convergence) must be
deterministic and genuinely fusion-dependent: by default the label is
the AND of the image bit and the text bit, so no single modality can
score above 75% accuracy (while each still carries first-order gradient
signal — XOR, also available via ``task``, has none and from-scratch
models plateau; both measured). Guards the end-to-end convergence
demonstration recorded in BENCH_NOTES.md ("End-to-end convergence").
"""

import os
import sys

import numpy as np
import pytest

CONV_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "tools", "benchmarks", "convergence",
)
sys.path.insert(0, CONV_DIR)

from user_dir.synth_memes import _TOK_A, SynthMemes  # noqa: E402


@pytest.fixture(scope="module")
def train_ds():
    return SynthMemes({}, "train")


def _bits(sample):
    bit_img = int(np.mean(sample["image"]) > 0)
    bit_txt = int(sample["input_ids"][1] == _TOK_A)
    return bit_img, bit_txt


def test_deterministic(train_ds):
    other = SynthMemes({}, "train")
    for idx in (0, 3, 511):
        a, b = train_ds[idx], other[idx]
        np.testing.assert_array_equal(a["image"], b["image"])
        np.testing.assert_array_equal(a["input_ids"], b["input_ids"])
        assert a["targets"] == b["targets"]


def test_default_label_is_and_of_modal_bits(train_ds):
    for idx in range(64):
        s = train_ds[idx]
        bit_img, bit_txt = _bits(s)
        assert int(s["targets"]) == (bit_img & bit_txt)


def test_task_knob_selects_label_rule():
    xor = SynthMemes({"task": "xor"}, "train")
    for idx in range(64):
        s = xor[idx]
        bit_img, bit_txt = _bits(s)
        assert int(s["targets"]) == bit_img ^ bit_txt


def test_single_modality_capped_below_fusion(train_ds):
    """Under AND the best unimodal decision rule (majority label within
    each bit value) caps near 75%; only fusion reaches ~100%."""
    labels, img_bits, txt_bits = [], [], []
    for idx in range(len(train_ds)):
        s = train_ds[idx]
        bi, bt = _bits(s)
        labels.append(int(s["targets"]))
        img_bits.append(bi)
        txt_bits.append(bt)
    labels = np.array(labels)
    for bits in (np.array(img_bits), np.array(txt_bits)):
        accs = []
        for b in (0, 1):
            sel = labels[bits == b]
            accs.append(max(sel.mean(), 1 - sel.mean()) * len(sel))
        best_unimodal = sum(accs) / len(labels)
        assert best_unimodal < 0.85, "one modality alone predicts the label"


def test_splits_disjoint_and_balanced():
    train, val = SynthMemes({}, "train"), SynthMemes({}, "val")
    train_ids = {int(train[i]["id"]) for i in range(len(train))}
    val_ids = {int(val[i]["id"]) for i in range(len(val))}
    assert not train_ids & val_ids
    # AND of two fair bits: ~25% positives
    frac = np.mean([int(val[i]["targets"]) for i in range(len(val))])
    assert 0.1 < frac < 0.45
