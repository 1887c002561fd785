"""Extract ResNet-152 grid features for a folder of images
(parity with mmf/tools/scripts/features/extract_resnet152_feat.py), using
the in-repo flax ResNet on TPU/CPU. Writes one .npy per image."""

from __future__ import annotations

import argparse
import os

import numpy as np


def build_feature_fn(num_features: int):
    import jax

    from mmf_tpu.modules.encoders import ResNet152ImageEncoder

    encoder = ResNet152ImageEncoder(num_output_features=num_features)

    def init(batch):
        return encoder.init(jax.random.PRNGKey(0), batch)

    @jax.jit
    def forward(variables, batch):
        return encoder.apply(variables, batch)

    return encoder, init, forward


def preprocess(image_path: str, size=224):
    from PIL import Image

    img = Image.open(image_path).convert("RGB").resize((size, size))
    arr = np.asarray(img, np.float32) / 255.0
    mean = np.asarray([0.485, 0.456, 0.406], np.float32)
    std = np.asarray([0.229, 0.224, 0.225], np.float32)
    arr = (arr - mean) / std
    return arr.transpose(2, 0, 1)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--image_dir", required=True)
    parser.add_argument("--out_dir", required=True)
    parser.add_argument("--num_features", type=int, default=49,
                        help="grid cells (-1 keeps the 7x7 map)")
    parser.add_argument("--batch_size", type=int, default=32)
    parser.add_argument("--checkpoint", default=None,
                        help="orbax params for a pretrained ResNet-152")
    args = parser.parse_args()

    os.makedirs(args.out_dir, exist_ok=True)
    images = sorted(
        f for f in os.listdir(args.image_dir)
        if f.lower().endswith((".jpg", ".jpeg", ".png"))
    )
    encoder, init, forward = build_feature_fn(args.num_features)
    variables = None
    if args.checkpoint:
        import orbax.checkpoint as ocp

        variables = ocp.PyTreeCheckpointer().restore(args.checkpoint)

    for start in range(0, len(images), args.batch_size):
        chunk = images[start:start + args.batch_size]
        batch = np.stack([
            preprocess(os.path.join(args.image_dir, f)) for f in chunk
        ])
        if variables is None:
            variables = init(batch)
        feats = np.asarray(forward(variables, batch))
        for fname, feat in zip(chunk, feats):
            out = os.path.join(
                args.out_dir, os.path.splitext(fname)[0] + ".npy"
            )
            np.save(out, feat)
        print(f"{start + len(chunk)}/{len(images)}")


if __name__ == "__main__":
    main()
