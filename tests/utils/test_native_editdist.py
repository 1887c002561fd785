"""C edit-distance/ANLS kernels vs the python reference."""

import random
import string

from mmf_tpu.utils.native.editdist import (
    _edit_distance_python,
    anls_best,
    edit_distance,
)


def test_known_distances():
    assert edit_distance("kitten", "sitting") == 3
    assert edit_distance("", "abc") == 3
    assert edit_distance("abc", "") == 3
    assert edit_distance("same", "same") == 0


def test_matches_python_on_random_pairs():
    rng = random.Random(7)
    for _ in range(200):
        a = "".join(rng.choices(string.ascii_lowercase + " 0123456789",
                                k=rng.randint(0, 40)))
        b = "".join(rng.choices(string.ascii_lowercase + " 0123456789",
                                k=rng.randint(0, 40)))
        assert edit_distance(a, b) == _edit_distance_python(a, b)


def test_unicode_char_level():
    # multibyte input must be measured in characters, not bytes
    assert edit_distance("café", "cafe") == 1


def test_anls_best_rule():
    # exact match -> 1.0; below-0.5 similarity -> 0
    assert anls_best("stop sign", ["bus", "stop sign"]) == 1.0
    assert anls_best("xyz", ["hello", "world"]) == 0.0
    # 1 edit over len 9 -> 8/9 ≈ 0.888 (>= 0.5 threshold)
    got = anls_best("stop sign", ["stop sing"])
    assert abs(got - (1 - 2 / 9)) < 1e-9


def test_anls_empty_gts():
    assert anls_best("anything", []) == 0.0
