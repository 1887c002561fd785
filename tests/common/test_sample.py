import numpy as np
import pytest

from mmf_tpu.common.sample import (
    Sample,
    SampleList,
    convert_batch_to_sample_list,
)


def _make_samples(n=4):
    samples = []
    for i in range(n):
        s = Sample()
        s.input_ids = np.arange(8, dtype=np.int32)
        s.image_feature_0 = np.ones((10, 16), dtype=np.float32) * i
        s.targets = np.float32(i % 2)
        s.question_id = i
        s.text = f"question {i}"
        samples.append(s)
    return samples


def test_sample_attr_access():
    s = Sample({"a": 1})
    s.b = 2
    assert s.a == 1 and s["b"] == 2
    assert set(s.fields()) == {"a", "b"}
    with pytest.raises(AttributeError):
        _ = s.missing


def test_samplelist_stacks_fixed_shapes():
    sl = SampleList(_make_samples(4))
    assert sl.input_ids.shape == (4, 8)
    assert sl.image_feature_0.shape == (4, 10, 16)
    assert sl.get_batch_size() == 4
    assert sl.text == [f"question {i}" for i in range(4)]
    # ints become arrays
    assert sl.question_id.shape == (4,)


def test_samplelist_mismatched_shapes_raises():
    samples = _make_samples(2)
    samples[1].image_feature_0 = np.ones((11, 16), dtype=np.float32)
    with pytest.raises(AssertionError):
        SampleList(samples)


def test_add_field_size_check():
    sl = SampleList(_make_samples(4))
    with pytest.raises(AssertionError):
        sl.add_field("bad", np.zeros((3, 2)))
    sl.add_field("good", np.zeros((4, 2)))
    assert "good" in sl.fields()


def test_pytree_meta_split():
    sl = SampleList(_make_samples(4))
    tree = sl.pytree()
    assert "input_ids" in tree and "text" not in tree
    meta = sl.meta()
    assert "text" in meta and "input_ids" not in meta


def test_nested_sample():
    samples = []
    for i in range(3):
        s = Sample()
        s.image_info_0 = Sample({"max_features": np.int32(7 + i)})
        s.x = np.zeros(4, dtype=np.float32)
        samples.append(s)
    sl = SampleList(samples)
    assert isinstance(sl.image_info_0, SampleList)
    assert sl.image_info_0.max_features.shape == (3,)
    tree = sl.pytree()
    assert tree["image_info_0"]["max_features"].shape == (3,)


def test_convert_batch_to_sample_list():
    d = {"x": np.zeros((2, 3)), "y": ["a", "b"]}
    sl = convert_batch_to_sample_list(d)
    assert isinstance(sl, SampleList)
    assert sl.get_batch_size() == 2
