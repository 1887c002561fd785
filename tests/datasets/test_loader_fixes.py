"""Regression tests for dataset-layer review findings: eval-epoch
termination, equal multi-replica shards, bbox-processor purity,
torchvision Resize(int) semantics, RoBERTa pair encoding."""

import numpy as np

from mmf_tpu.common.sample import Sample
from mmf_tpu.datasets import iteration_strategies
from mmf_tpu.datasets.loader import DataLoader, EpochSampler
from mmf_tpu.datasets.multi_dataloader import MultiDataLoader
from mmf_tpu.datasets.processors.processors import TransformerBboxProcessor


class _TinyDataset:
    def __init__(self, n, name):
        self.n = n
        self.dataset_name = name
        self.dataset_type = "val"

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        s = Sample()
        s["x"] = np.float32(i)
        return s


def _loader(n, name):
    return DataLoader(_TinyDataset(n, name), batch_size=2, drop_last=False,
                      num_workers=0, shuffle=False)


def test_multi_dataset_eval_epoch_terminates():
    """Two unequal datasets under the eval strategy: the epoch must end
    after every dataset is exhausted exactly once (previously RoundRobin
    reignited finished iterators forever)."""
    loaders = {"a": _loader(6, "a"), "b": _loader(2, "b")}
    strategy = iteration_strategies.RoundRobinIterationStrategy(
        {"skip_epoch_check": True, "exhaust_all": True}, loaders
    )
    ml = MultiDataLoader(loaders, strategy)
    batches = list(ml)
    # 3 batches from a + 1 from b, each seen once
    assert len(batches) == 4
    names = sorted(b.dataset_name for b in batches)
    assert names == ["a", "a", "a", "b"]


def test_epoch_sampler_equal_shards():
    """101 samples over 2 replicas: both ranks must yield the same count
    (DistributedSampler-style wrap padding) and match __len__."""
    s0 = EpochSampler(101, shuffle=False, num_replicas=2, rank=0)
    s1 = EpochSampler(101, shuffle=False, num_replicas=2, rank=1)
    i0, i1 = list(s0), list(s1)
    assert len(i0) == len(i1) == len(s0) == 51
    # the wrap pad repeats an early index, never drops one
    assert set(i0) | set(i1) == set(range(101))


def test_transformer_bbox_processor_pure_and_reusable():
    """The processor must not mutate its input: with fast_read one cached
    info dict is shared across questions; reprocessing the SAME dict must
    give identical output (no double normalization)."""
    proc = TransformerBboxProcessor(config={})
    info = {
        "bbox": np.asarray([[10, 20, 110, 220]], np.float32),
        "image_width": 200,
        "image_height": 400,
    }
    out1 = proc(info)
    assert np.asarray(info["bbox"]).shape == (1, 4), "input mutated"
    out2 = proc(info)
    np.testing.assert_array_equal(out1["bbox"], out2["bbox"])
    np.testing.assert_allclose(
        out1["bbox"][0, :4], [10 / 200, 20 / 400, 110 / 200, 220 / 400]
    )


def test_resize_int_preserves_aspect_ratio():
    from mmf_tpu.datasets.processors.image_processors import Resize

    img = np.zeros((3, 480, 640), np.float32)  # H=480 W=640
    out = Resize(256)(img)
    assert out.shape == (3, 256, 341), out.shape  # shortest side -> 256
    out2 = Resize((256, 256))(img)
    assert out2.shape == (3, 256, 256)


def test_roberta_pair_double_separator():
    """RoBERTa pairs encode as <s> A </s> </s> B </s>."""
    from mmf_tpu.datasets.processors.bert_processors import (
        MaskedRobertaTokenizer,
    )

    proc = MaskedRobertaTokenizer.__new__(MaskedRobertaTokenizer)
    proc._max_seq_length = 12
    proc._probability = 0.0
    proc._tokenizer = None

    # stub the pieces that need a real tokenizer
    proc._convert_tokens_to_ids = lambda tokens: list(range(len(tokens)))
    out = proc._convert_to_indices(["hello", "world"], ["bye"],
                                   probability=0.0)
    assert out["tokens"] == ["<s>", "hello", "world", "</s>", "</s>",
                             "bye", "</s>"]
    assert (out["segment_ids"] == 0).all()
    assert len(out["input_ids"]) == 12  # padded
