"""utils.general: batch-size division and epoch<->update conversion
(reference test surface: tests/trainers/test_training_loop.py:149-205)."""

import pytest

from mmf_tpu.config import omega
from mmf_tpu.utils import general


def _cfg(**training):
    return omega.create({"training": training})


def test_get_batch_size_divides_by_process_count(monkeypatch):
    import jax

    monkeypatch.setattr(jax, "process_count", lambda: 2)
    monkeypatch.setattr(jax, "device_count", lambda: 16)
    assert general.get_batch_size(_cfg(batch_size=8)) == 4


def test_get_batch_size_indivisible_raises(monkeypatch):
    import jax

    monkeypatch.setattr(jax, "process_count", lambda: 3)
    with pytest.raises(RuntimeError, match="divisible"):
        general.get_batch_size(_cfg(batch_size=8))


def test_batch_size_per_device_scales_with_local_devices(monkeypatch):
    import jax

    monkeypatch.setattr(jax, "process_count", lambda: 2)
    monkeypatch.setattr(jax, "device_count", lambda: 16)
    # per-device 4 with 8 local devices -> this process feeds 32
    cfg = _cfg(batch_size=512, batch_size_per_device=4)
    assert general.get_batch_size(cfg) == 32


class _Loader:
    def __len__(self):
        return 100


def test_get_max_updates_from_updates():
    assert general.get_max_updates(2, None, _Loader(), 1)[0] == 2


def test_get_max_updates_fractional_epoch():
    # 0.04 epochs over a 100-batch loader = 4 updates
    max_updates, _ = general.get_max_updates(None, 0.04, _Loader(), 1)
    assert max_updates == 4


def test_get_max_updates_epochs_ignore_update_frequency():
    # update_frequency splits the batch into microbatches INSIDE the
    # jitted step here (one loader batch == one update), so epochs
    # convert without dividing by it — a documented deviation from the
    # reference's host-side accumulation (general.py:337-368)
    max_updates, _ = general.get_max_updates(None, 2, _Loader(), 4)
    assert max_updates == 200


def test_get_max_updates_requires_one():
    with pytest.raises(ValueError):
        general.get_max_updates(None, None, _Loader(), 1)
