"""The convergence-demo dataset (tools/benchmarks/convergence) must be
deterministic and genuinely fusion-dependent: the label is the XOR of
the image bit and the text bit, so neither modality alone can predict
it. Guards the end-to-end convergence demonstration recorded in
BENCH_NOTES.md ("End-to-end convergence").
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


def test_label_is_xor_of_modal_bits(train_ds):
    for idx in range(64):
        s = train_ds[idx]
        bit_img, bit_txt = _bits(s)
        assert int(s["targets"]) == bit_img ^ bit_txt


def test_single_modality_is_uninformative(train_ds):
    """Over the split, each bit alone must be ~chance vs the label."""
    labels, img_bits, txt_bits = [], [], []
    for idx in range(len(train_ds)):
        s = train_ds[idx]
        bi, bt = _bits(s)
        labels.append(int(s["targets"]))
        img_bits.append(bi)
        txt_bits.append(bt)
    labels = np.array(labels)
    for bits in (np.array(img_bits), np.array(txt_bits)):
        acc = max((bits == labels).mean(), (bits != labels).mean())
        assert acc < 0.6, "one modality alone predicts the label"


def test_splits_disjoint_and_balanced():
    train, val = SynthMemes({}, "train"), SynthMemes({}, "val")
    train_ids = {int(train[i]["id"]) for i in range(len(train))}
    val_ids = {int(val[i]["id"]) for i in range(len(val))}
    assert not train_ids & val_ids
    frac = np.mean([int(val[i]["targets"]) for i in range(len(val))])
    assert 0.2 < frac < 0.8
