import os

import numpy as np
import pytest

from mmf_tpu.common.registry import registry
from mmf_tpu.utils.env import setup_imports

setup_imports()


@pytest.fixture(scope="module")
def vocab_file(tmp_path_factory):
    p = tmp_path_factory.mktemp("vocab") / "vocab.txt"
    words = ["<pad>", "<s>", "</s>", "<unk>", "red", "blue", "apple", "dog",
             "cat", "one", "two"]
    p.write_text("\n".join(words))
    return str(p)


def test_vocab_processor(vocab_file):
    cls = registry.get_processor_class("vocab")
    proc = cls({"max_length": 6,
                "vocab": {"type": "random", "vocab_file": vocab_file,
                          "embedding_dim": 16}})
    out = proc({"tokens": ["red", "apple", "zebra"]})
    assert out["text"].shape == (6,)
    assert out["length"] == 3
    # unknown word -> UNK index
    assert out["text"][2] == proc.vocab.get_unk_index()


def test_vqa_answer_processor_scores(vocab_file):
    cls = registry.get_processor_class("vqa_answer")
    proc = cls({"vocab_file": vocab_file, "num_answers": 10,
                "preprocessor": {"type": "simple_word", "params": {}}})
    answers = ["red"] * 6 + ["blue"] * 4
    out = proc({"answers": answers})
    scores = out["answers_scores"]
    red_idx = proc.answer_vocab.word2idx("red")
    blue_idx = proc.answer_vocab.word2idx("blue")
    # 6 red matches -> min(1, matched/3) averaged = 1.0
    assert scores[red_idx] == 1.0
    assert 0 < scores[blue_idx] <= 1.0


def test_multi_hot_answer(vocab_file):
    cls = registry.get_processor_class("multi_hot_answer_from_vocab")
    proc = cls({"vocab_file": vocab_file, "num_answers": 10,
                "preprocessor": {"type": "simple_word", "params": {}}})
    out = proc({"answers": ["red", "blue"]})
    scores = out["answers_scores"]
    assert scores[proc.answer_vocab.word2idx("red")] == 1.0
    assert scores.sum() == 2.0


def test_soft_copy_answer(vocab_file):
    cls = registry.get_processor_class("soft_copy_answer")
    proc = cls({"vocab_file": vocab_file, "num_answers": 10, "max_length": 5,
                "preprocessor": {"type": "simple_word", "params": {}}})
    out = proc({"answers": ["zebra"] * 10, "tokens": ["zebra", "dog"]})
    scores = out["answers_scores"]
    assert scores.shape == (proc.get_true_vocab_size() + 5,)
    # OCR token "zebra" matches all answers -> copy score 1.0
    assert scores[proc.get_true_vocab_size()] == 1.0


def test_m4c_answer_processor(vocab_file):
    cls = registry.get_processor_class("m4c_answer")
    proc = cls({"vocab_file": vocab_file, "num_answers": 10,
                "max_length": 5, "max_copy_steps": 4,
                "preprocessor": {"type": "simple_word", "params": {}}})
    out = proc({"answers": ["red"] * 10, "tokens": ["stop", "red"]})
    assert out["answers_scores"].shape == (4, proc.get_vocab_size())
    assert out["train_prev_inds"].shape == (4,)
    assert out["train_prev_inds"][0] == proc.BOS_IDX
    assert out["train_loss_mask"].sum() >= 1
    # score at step 0 for "red" (vocab or copy) must be 1.0
    assert out["answers_scores"][0].max() == 1.0


def test_phoc_processor():
    cls = registry.get_processor_class("phoc")
    proc = cls({"max_length": 3})
    out = proc({"tokens": ["hello", "world"]})
    assert out["text"].shape == (3, 604)
    assert out["text"][0].sum() > 0
    assert out["text"][2].sum() == 0  # padding


def test_bert_tokenizer():
    cls = registry.get_processor_class("bert_tokenizer")
    proc = cls({"max_seq_length": 16,
                "tokenizer_config": {"type": "bert-base-uncased", "vocab_file": "tests/data/vocab.txt"}})
    out = proc({"text": "what color is the apple?"})
    assert out["input_ids"].shape == (16,)
    assert out["input_mask"].shape == (16,)
    assert out["segment_ids"].shape == (16,)
    assert out["input_ids"][0] == proc._tokenizer.cls_token_id
    assert (out["lm_label_ids"] == -1).all()  # no masking


def test_masked_token_processor_masks():
    cls = registry.get_processor_class("masked_token")
    proc = cls({"max_seq_length": 24, "mask_probability": 0.99,
                "tokenizer_config": {"type": "bert-base-uncased", "vocab_file": "tests/data/vocab.txt"}})
    out = proc({"text_a": "the quick brown fox jumps over the lazy dog",
                "text_b": None})
    # nearly everything masked -> many labels != -1
    assert (out["lm_label_ids"] != -1).sum() > 3


def test_simple_word_and_sentence():
    w = registry.get_processor_class("simple_word")()
    s = registry.get_processor_class("simple_sentence")()
    assert w({"text": "Hello?"})["text"] == "hello"
    assert s({"text": "What is, this?"})["text"] == ["what", "is", "this"]


def test_copy_processor():
    cls = registry.get_processor_class("copy")
    proc = cls({"max_length": 10})
    blob = np.ones((4, 7), np.float32)
    out = proc({"blob": blob})["blob"]
    assert out.shape == (10, 7)
    assert out[:4].sum() == 28 and out[4:].sum() == 0


def test_transformer_bbox_processor():
    cls = registry.get_processor_class("transformer_bbox")
    proc = cls({})
    out = proc({"bbox": np.asarray([[0, 0, 50, 100]], np.float32),
                "image_width": 100, "image_height": 200})
    bbox = out["bbox"]
    assert bbox.shape == (1, 5)
    np.testing.assert_allclose(bbox[0, :4], [0, 0, 0.5, 0.5])
    np.testing.assert_allclose(bbox[0, 4], 0.25)


def test_torchvision_transforms_processor():
    cls = registry.get_processor_class("torchvision_transforms")
    proc = cls({"transforms": [
        {"type": "Resize", "params": {"size": [8, 8]}},
        "ToTensor",
        {"type": "Normalize", "params": {"mean": [0.5, 0.5, 0.5],
                                         "std": [0.5, 0.5, 0.5]}},
    ]})
    img = np.random.rand(3, 16, 16).astype(np.float32)
    out = proc(img)
    assert out.shape == (3, 8, 8)


def test_caption_processor(tmp_path):
    vocab_path = tmp_path / "cap_vocab.txt"
    vocab_path.write_text("\n".join(["a", "cat", "sits"]))
    cls = registry.get_processor_class("caption")
    proc = cls({"vocab": {"type": "random", "vocab_file": str(vocab_path),
                          "embedding_dim": 8}})
    # SOS=1, then tokens at offsets 4.., EOS=2
    out = proc([1, 4, 5, 6, 2])
    assert out["caption"] == "a cat sits"


def test_masked_region_processor():
    cls = registry.get_processor_class("masked_region")
    proc = cls({"mask_probability": 1.0})
    feat = np.ones((5, 8), np.float32)
    masked, labels = proc(feat)
    assert (labels == 1).all()


def test_multi_sentence_bert_tokenizer():
    cls = registry.get_processor_class("multi_sentence_bert_tokenizer")
    proc = cls({"max_seq_length": 8,
                "tokenizer_config": {"type": "bert-base-uncased", "vocab_file": "tests/data/vocab.txt"}})
    out = proc({"text": ["hello there", "red apple"]})
    assert out["input_ids"].shape == (16,)


def test_charades_audio_processor_chain():
    """The reference charades audio pipeline (truncate_or_pad ->
    MelSpectrogram -> ToPILImage, configs/datasets/charades/
    defaults.yaml) composes through torchvision_transforms."""
    cls = registry.get_processor_class("torchvision_transforms")
    proc = cls({"transforms": [
        {"type": "truncate_or_pad", "params": {"output_size": 1000}},
        "MelSpectrogram", "ToPILImage"]})
    rng = np.random.RandomState(0)
    out = np.asarray(proc(rng.randn(2, 4000).astype(np.float32)))
    assert out.shape[0] == 128  # mel bins
    assert np.isfinite(out).all()
    # mono + shorter-than-output waveforms pad instead of crashing
    out2 = np.asarray(proc(rng.randn(300).astype(np.float32)))
    assert out2.shape == out.shape


def test_mel_spectrogram_tone():
    """A pure tone concentrates energy in one mel band region."""
    from mmf_tpu.datasets.processors.image_processors import MelSpectrogram

    sr = 16000
    t = np.arange(sr, dtype=np.float32) / sr
    tone = np.sin(2 * np.pi * 1000.0 * t)  # 1 kHz
    mel = MelSpectrogram(sample_rate=sr)(tone)
    peak_band = int(mel.mean(axis=1).argmax())
    # 1 kHz lands mid-low in 128 HTK mel bands for a 8 kHz Nyquist
    assert 20 <= peak_band <= 70, peak_band
