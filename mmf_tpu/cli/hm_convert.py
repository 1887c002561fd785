"""mmf_convert_hm: Hateful Memes zip -> framework data layout
(parity with mmf_cli/hm_convert.py:210)."""

from __future__ import annotations

import argparse
import hashlib
import json
import os
import shutil
import zipfile


class HMConverter:
    IMAGE_FILES = ["img.tar.gz", "img"]
    JSONL_PHASE_ONE_FILES = ["train.jsonl", "dev.jsonl", "test.jsonl"]
    JSONL_PHASE_TWO_FILES = [
        "train.jsonl", "dev_seen.jsonl", "test_seen.jsonl",
        "dev_unseen.jsonl", "test_unseen.jsonl",
    ]
    POSSIBLE_CHECKSUMS = []  # filled when the official zip hash is known

    def __init__(self, zip_file: str, password: str = None,
                 output_dir: str = None, bypass_checksum: bool = False):
        self.zip_file = zip_file
        self.password = password
        self.bypass_checksum = bypass_checksum
        if output_dir is None:
            from mmf_tpu.config.configuration import resolve_dir

            output_dir = os.path.join(
                resolve_dir("MMF_DATA_DIR"), "datasets", "hateful_memes",
                "defaults",
            )
        self.output_dir = output_dir

    def _checksum(self) -> str:
        sha = hashlib.sha256()
        with open(self.zip_file, "rb") as f:
            for chunk in iter(lambda: f.read(1024 * 1024), b""):
                sha.update(chunk)
        return sha.hexdigest()

    def convert(self):
        if not self.bypass_checksum and self.POSSIBLE_CHECKSUMS:
            digest = self._checksum()
            assert digest in self.POSSIBLE_CHECKSUMS, (
                f"Checksum {digest} does not match the known Hateful Memes "
                "zip checksums; pass --bypass_checksum to skip"
            )
        extract_dir = os.path.join(self.output_dir, "_extract")
        os.makedirs(extract_dir, exist_ok=True)
        with zipfile.ZipFile(self.zip_file) as zf:
            if self.password:
                zf.setpassword(self.password.encode())
            zf.extractall(extract_dir)

        ann_dir = os.path.join(self.output_dir, "annotations")
        img_dir = os.path.join(self.output_dir, "images")
        os.makedirs(ann_dir, exist_ok=True)
        os.makedirs(img_dir, exist_ok=True)

        # the jsonls may live under data/ or at the archive root — pick
        # the root FIRST, then detect the phase against it (checking only
        # data/ misclassified root-layout phase-2 zips as phase 1 and
        # silently dropped the seen/unseen splits)
        data_root = os.path.join(extract_dir, "data")
        if not os.path.exists(data_root):
            data_root = extract_dir
        phase = 2 if os.path.exists(
            os.path.join(data_root, "dev_unseen.jsonl")
        ) else 1
        files = (self.JSONL_PHASE_TWO_FILES if phase == 2
                 else self.JSONL_PHASE_ONE_FILES)
        for f in files:
            src = os.path.join(data_root, f)
            if os.path.exists(src):
                shutil.copy2(src, os.path.join(ann_dir, f))
        src_img = os.path.join(data_root, "img")
        if os.path.exists(src_img):
            dst_img = os.path.join(img_dir, "img")
            if os.path.exists(dst_img):
                shutil.rmtree(dst_img)
            shutil.move(src_img, dst_img)
        else:
            # images may ship as img.tar.gz (IMAGE_FILES advertises it)
            tarball = os.path.join(data_root, "img.tar.gz")
            if os.path.exists(tarball):
                import tarfile

                with tarfile.open(tarball) as tf:
                    tf.extractall(img_dir)
        shutil.rmtree(extract_dir, ignore_errors=True)
        print(f"Converted Hateful Memes (phase {phase}) to {self.output_dir}")


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--zip_file", required=True)
    parser.add_argument("--password", default=None)
    parser.add_argument("--output_dir", default=None)
    parser.add_argument("--bypass_checksum", action="store_true")
    args = parser.parse_args()
    HMConverter(
        args.zip_file, args.password, args.output_dir, args.bypass_checksum
    ).convert()


if __name__ == "__main__":
    main()
