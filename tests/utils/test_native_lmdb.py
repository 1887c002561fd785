"""Native LMDB core: write/read round trip (incl. overflow-page values),
sorted cursor iteration, tool conversion, and the LMDBFeatureReader path."""

import os
import pickle
import subprocess
import sys

import numpy as np
import pytest

from mmf_tpu.utils.native import lmdb_shim

pytestmark = pytest.mark.skipif(
    not lmdb_shim.available(), reason="no C++ compiler for the native core"
)


def test_roundtrip_small_and_overflow(tmp_path):
    path = str(tmp_path / "env")
    rng = np.random.RandomState(0)
    items = {}
    env = lmdb_shim.open(path, readonly=False, create=True)
    with env.begin(write=True) as txn:
        for i in range(40):
            key = f"k_{i:04d}".encode()
            # every 3rd value is large enough to need overflow pages
            n = 2000 if i % 3 == 0 else 5
            val = pickle.dumps(rng.randn(n).astype(np.float32))
            items[key] = val
            assert txn.put(key, val)
    env.close()

    env = lmdb_shim.open(path, readonly=True)
    assert env.stat()["entries"] == 40
    with env.begin() as txn:
        for key, val in items.items():
            assert txn.get(key) == val
        assert txn.get(b"absent") is None
        keys = [k for k, _ in txn.cursor().iternext()]
        assert keys == sorted(items.keys())
    env.close()


def test_many_entries_build_branch_pages(tmp_path):
    """Enough entries to force a multi-level B+tree."""
    path = str(tmp_path / "deep")
    env = lmdb_shim.open(path, readonly=False, create=True)
    with env.begin(write=True) as txn:
        for i in range(5000):
            txn.put(f"{i:08d}".encode(), f"value-{i}".encode())
    env.close()

    env = lmdb_shim.open(path, readonly=True)
    with env.begin() as txn:
        assert txn.get(b"00000000") == b"value-0"
        assert txn.get(b"00002500") == b"value-2500"
        assert txn.get(b"00004999") == b"value-4999"
        count = sum(1 for _ in txn.cursor().iternext(values=False))
    assert count == 5000
    env.close()


def test_lmdb_feature_reader_matches_npy(tmp_path):
    from mmf_tpu.datasets.databases.readers.feature_readers import (
        FeatureReader,
    )

    feats = tmp_path / "feats"
    feats.mkdir()
    rng = np.random.RandomState(1)
    arrays = {}
    for i in range(3):
        a = rng.randn(5, 8).astype(np.float32)
        arrays[f"{i:05d}"] = a
        np.save(feats / f"{i:05d}.npy", a)

    tool = os.path.join("tools", "scripts", "features",
                        "lmdb_conversion.py")
    lmdb_path = str(tmp_path / "feats.lmdb")
    subprocess.check_call([
        sys.executable, tool, "--mode", "convert",
        "--features_folder", str(feats), "--lmdb_path", lmdb_path,
    ])

    reader = FeatureReader(lmdb_path, depth_first=False, max_features=5)
    for name, expected in arrays.items():
        feat, info = reader.read(f"{name}.npy")
        np.testing.assert_allclose(np.asarray(feat)[:5], expected,
                                   atol=1e-6)
