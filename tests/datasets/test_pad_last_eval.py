"""Eval tail-batch padding: loaders pad the final short batch to keep XLA
shapes constant, and reports trim padded rows before metrics."""

import numpy as np

from mmf_tpu.common.report import Report
from mmf_tpu.common.sample import Sample, SampleList
from mmf_tpu.datasets.loader import DataLoader, EpochSampler


class _Toy:
    def __init__(self, n):
        self.n = n

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        s = Sample()
        s.x = np.full((3,), i, np.float32)
        return s


def _loader(n, bs, **kw):
    return DataLoader(
        _Toy(n), batch_size=bs,
        sampler=EpochSampler(n, shuffle=False),
        num_workers=0, **kw,
    )


def test_drop_last_counts():
    assert len(_loader(10, 4, drop_last=True)) == 2
    assert len(list(_loader(10, 4, drop_last=True))) == 2


def test_pad_last_fills_and_marks():
    loader = _loader(10, 4, drop_last=False, pad_last=True)
    assert len(loader) == 3
    batches = list(loader)
    assert all(b.get_batch_size() == 4 for b in batches)
    # first two are full: no marker
    assert getattr(batches[0], "_true_batch_size", None) is None
    # last is 2 real + 2 cycled
    assert getattr(batches[2], "_true_batch_size", None) == 2
    np.testing.assert_array_equal(batches[2].x[:, 0], [8, 9, 8, 9])


def test_report_trim_plain_and_fanout():
    batch = SampleList()
    batch.add_field("ids", np.arange(4))
    out = {
        "scores": np.arange(8).reshape(4, 2),          # [B, D]
        "targets": np.arange(12).reshape(12, 1),       # [B*3, 1] fan-out
        "losses": {"val/x/loss": np.float32(1.0)},
    }
    report = Report(batch, out).trim_to_batch_size(3)
    assert report.batch_size == 3
    assert report.scores.shape == (3, 2)
    assert report.targets.shape == (9, 1)
    assert report.ids.shape == (3,)
    # losses untouched
    assert float(report.losses["val/x/loss"]) == 1.0


def test_report_trim_noop_when_full():
    batch = SampleList()
    batch.add_field("ids", np.arange(4))
    report = Report(batch, {"losses": {}}).trim_to_batch_size(4)
    assert report.ids.shape == (4,)
