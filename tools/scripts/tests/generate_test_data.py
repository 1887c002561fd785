"""Generate small synthetic data artifacts for tests
(parity with mmf/tools/scripts/tests/generate_test_data.py)."""

from __future__ import annotations

import argparse
import json
import os

import numpy as np


def generate_hm_data(out_dir, n=16, image_size=64):
    from PIL import Image

    os.makedirs(os.path.join(out_dir, "images", "img"), exist_ok=True)
    rng = np.random.RandomState(0)
    texts = ["a funny meme", "mean meme", "cats are great", "fine content"]
    entries = []
    for i in range(n):
        p = f"img/{i:05d}.png"
        Image.fromarray(
            rng.randint(0, 255, (image_size, image_size, 3), dtype=np.uint8)
        ).save(os.path.join(out_dir, "images", p))
        entries.append({"id": i, "img": p, "label": i % 2,
                        "text": texts[i % len(texts)]})
    for split in ("train", "dev_unseen", "test_unseen"):
        with open(os.path.join(out_dir, f"{split}.jsonl"), "w") as f:
            for e in entries:
                f.write(json.dumps(e) + "\n")


def generate_vqa_features(out_dir, n=16, regions=10, dim=2048):
    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.RandomState(0)
    for i in range(n):
        np.save(os.path.join(out_dir, f"{i:05d}.npy"),
                rng.randn(regions, dim).astype(np.float32))


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--out_dir", required=True)
    parser.add_argument("--kind", choices=["hm", "vqa_features"],
                        default="hm")
    args = parser.parse_args()
    if args.kind == "hm":
        generate_hm_data(args.out_dir)
    else:
        generate_vqa_features(args.out_dir)
