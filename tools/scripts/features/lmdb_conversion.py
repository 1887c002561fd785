"""Convert a folder of .npy features to/from LMDB
(parity with mmf/tools/scripts/features/lmdb_conversion.py).
Uses the lmdb package when installed, else the in-repo native core."""

from __future__ import annotations

import argparse
import glob
import os
import pickle
import sys

import numpy as np

sys.path.insert(
    0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..", "..", ".."))
)


def _lmdb():
    try:
        import lmdb

        return lmdb
    except ImportError:
        from mmf_tpu.utils.native import lmdb_shim

        return lmdb_shim


def extract_features(lmdb_path, output_dir):
    env = _lmdb().open(lmdb_path, readonly=True, lock=False)
    os.makedirs(output_dir, exist_ok=True)
    with env.begin(write=False) as txn:
        keys = pickle.loads(txn.get(b"keys"))
        for key in keys:
            item = pickle.loads(txn.get(key))
            np.save(os.path.join(output_dir, key.decode() + ".npy"), item)


def convert_to_lmdb(features_dir, lmdb_path):
    files = [
        f for f in glob.glob(os.path.join(features_dir, "**", "*.npy"),
                             recursive=True)
        if not f.endswith("_info.npy")  # folded into their feature entry
    ]
    env = _lmdb().open(lmdb_path, map_size=1099511627776,
                       readonly=False, create=True)
    keys = []
    with env.begin(write=True) as txn:
        for f in files:
            key = os.path.splitext(os.path.relpath(f, features_dir))[0]
            keys.append(key.encode())
            item = {"features": np.load(f, allow_pickle=True)}
            info_path = f.replace(".npy", "_info.npy")
            if os.path.exists(info_path):
                item.update(np.load(info_path, allow_pickle=True).item())
            txn.put(keys[-1], pickle.dumps(item))
        txn.put(b"keys", pickle.dumps(keys))
    print(f"Wrote {len(keys)} entries to {lmdb_path}")


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--mode", choices=["extract", "convert"],
                        required=True)
    parser.add_argument("--lmdb_path", required=True)
    parser.add_argument("--features_folder", required=True)
    args = parser.parse_args()
    if args.mode == "extract":
        extract_features(args.lmdb_path, args.features_folder)
    else:
        convert_to_lmdb(args.features_folder, args.lmdb_path)
