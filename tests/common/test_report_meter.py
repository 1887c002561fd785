import numpy as np

from mmf_tpu.common.meter import Meter, SmoothedValue
from mmf_tpu.common.report import Report
from mmf_tpu.common.sample import Sample, SampleList


def _report():
    sl = SampleList([Sample({"x": np.zeros(3, dtype=np.float32)}) for _ in range(2)])
    out = {
        "scores": np.ones((2, 4), dtype=np.float32),
        "losses": {"train/ds/loss": np.float32(0.5)},
    }
    return Report(sl, out)


def test_report_merge():
    r = _report()
    assert r.batch_size == 2
    assert "scores" in r and "x" in r
    assert r.losses["train/ds/loss"] == np.float32(0.5)


def test_report_accumulate():
    r1 = _report()
    r2 = _report()
    r1.accumulate_tensor_fields_and_loss(r2, ["scores"])
    assert r1.scores.shape == (4, 4)
    assert float(r1.losses["train/ds/loss"]) == 1.0


def test_smoothed_value():
    sv = SmoothedValue(window_size=3)
    for v in [1.0, 2.0, 3.0, 4.0]:
        sv.update(v)
    assert sv.median == 3.0
    assert sv.global_avg == 2.5


def test_meter_total_loss():
    m = Meter()
    r = _report()
    r.losses = {"train/ds/a": np.float32(0.5), "train/ds/b": np.float32(0.25)}
    m.update_from_report(r)
    d = m.get_scalar_dict()
    assert abs(d["train/total_loss"] - 0.75) < 1e-6
