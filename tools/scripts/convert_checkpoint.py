"""Convert a torch MMF checkpoint into this framework's orbax format.

The conversion core is mmf_tpu/utils/checkpoint_updater.py (Linear
transpose, conv OIHW->HWIO, LayerNorm naming, HF-BERT key map, per-model
``format_state_key``); this CLI wires it end-to-end: build the target
model from config, initialize its parameter skeleton with a synthetic
batch, match the torch tensors onto it, and save an orbax checkpoint
loadable via ``checkpoint.resume_file``.

Usage:
  python tools/scripts/convert_checkpoint.py \
      --torch_checkpoint visual_bert.finetuned.vqa2.pth \
      --model visual_bert --dataset vqa2 \
      --output /ckpts/visual_bert_vqa2.ckpt \
      [--config projects/visual_bert/configs/vqa2/defaults.yaml]
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))


def synthetic_batch(batch_size=2, seq_len=16, regions=10, vdim=2048,
                    image_size=224):
    """Superset of the fields BERT-family multimodal models consume;
    models read only the keys they need."""
    rng = np.random.RandomState(0)
    return {
        "input_ids": rng.randint(0, 30522, (batch_size, seq_len)),
        "input_mask": np.ones((batch_size, seq_len), np.int32),
        "segment_ids": np.zeros((batch_size, seq_len), np.int32),
        "lm_label_ids": np.full((batch_size, seq_len), -1, np.int64),
        "image_feature_0": rng.randn(batch_size, regions, vdim).astype(
            np.float32
        ),
        "image_info_0": {
            "max_features": np.full((batch_size,), regions, np.int32),
            # transformer_bbox output: [x1,y1,x2,y2,area] normalized
            "bbox": rng.rand(batch_size, regions, 5).astype(np.float32),
        },
        "image": rng.randn(batch_size, 3, image_size, image_size).astype(
            np.float32
        ),
        "text": rng.randint(0, 1000, (batch_size, seq_len)),
        "text_len": np.full((batch_size,), seq_len, np.int32),
        "targets": np.zeros((batch_size, 2), np.float32),
    }


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--torch_checkpoint", required=True,
                        help=".pth/.ckpt torch state dict (or dict with "
                             "'model' key)")
    parser.add_argument("--model", required=True,
                        help="registered model name (e.g. visual_bert)")
    parser.add_argument("--dataset", required=True,
                        help="dataset key for config resolution")
    parser.add_argument("--output", required=True,
                        help="output orbax checkpoint directory")
    parser.add_argument("--config", default=None,
                        help="optional experiment yaml")
    parser.add_argument("--batch_size", type=int, default=2)
    parser.add_argument("--seq_len", type=int, default=16)
    parser.add_argument("--regions", type=int, default=10)
    parser.add_argument("--vdim", type=int, default=2048,
                        help="region-feature dim (v_feature_size)")
    args = parser.parse_args()

    if os.path.exists(args.output):
        raise SystemExit(f"ERROR: {args.output} already exists")
    if not os.path.exists(args.torch_checkpoint):
        raise SystemExit(
            f"ERROR: {args.torch_checkpoint} not found"
        )

    import jax
    import torch

    from mmf_tpu.common.registry import registry
    from mmf_tpu.config.configuration import Configuration
    from mmf_tpu.models.base_model import build_model
    from mmf_tpu.utils.checkpoint import _checkpointer, jax_device_get
    from mmf_tpu.utils.checkpoint_updater import (
        HF_BERT_KEY_MAP,
        MODEL_KEY_MAPS,
        convert_torch_state_dict,
    )
    from mmf_tpu.utils.env import setup_imports

    setup_imports()
    opts = [f"model={args.model}", f"datasets={args.dataset}"]
    if args.config:
        opts.insert(0, f"config={args.config}")
    config = Configuration(opts).get_config()
    registry.register("config", config)
    model = build_model(config)

    batch = synthetic_batch(args.batch_size, args.seq_len, args.regions, vdim=args.vdim)
    batch["dataset_name"] = args.dataset
    batch["dataset_type"] = "train"
    try:
        variables = model.init(
            {"params": jax.random.PRNGKey(0),
             "dropout": jax.random.PRNGKey(1)},
            batch, False,
        )
    except KeyError as e:
        raise SystemExit(
            f"ERROR: model '{args.model}' reads batch field {e} which the "
            "synthetic init batch does not provide; extend "
            "synthetic_batch() for this model family"
        )
    variables = jax_device_get(variables)

    raw = torch.load(args.torch_checkpoint, map_location="cpu",
                     weights_only=False)
    state_dict = raw.get("model", raw) if isinstance(raw, dict) else raw
    state_dict = {
        k: v.numpy() if hasattr(v, "numpy") else np.asarray(v)
        for k, v in state_dict.items()
        if hasattr(v, "shape")
    }

    # MMF checkpoints prefix the trunk with "model."; the flax tree keeps
    # the "bert" level, so only that wrapper prefix is stripped (the bare
    # "^bert." strip in HF_BERT_KEY_MAP is for trunk-only HF dicts)
    key_map = {r"^model\.": ""}
    # model-family-specific renames run FIRST (two-stream vilbert, mmbt
    # shared embeddings, vit backbones) so the generic HF-BERT patterns
    # don't rewrite their keys out from under them
    key_map.update(MODEL_KEY_MAPS.get(args.model, {}))
    key_map.update(
        {k: v for k, v in HF_BERT_KEY_MAP.items() if k != r"^bert\."}
    )
    fmt = getattr(type(model), "format_state_key", None)
    new_params, stats = convert_torch_state_dict(
        state_dict, variables["params"],
        key_map=key_map,
        format_state_key=(lambda k: fmt(k)) if fmt else None,
    )
    variables = dict(variables)
    variables["params"] = new_params

    print(f"matched {stats['matched']} tensors, "
          f"missed {stats['missed']}, "
          f"shape mismatches {stats['shape_mismatch']}")
    if stats["matched"] == 0:
        raise SystemExit("ERROR: no tensors matched — wrong model/ckpt pair?")

    _checkpointer().save(os.path.abspath(args.output),
                         {"variables": variables})
    print(f"saved converted checkpoint -> {args.output}")
    print("load with: checkpoint.resume_file="
          f"{args.output} checkpoint.resume_pretrained=true")


if __name__ == "__main__":
    main()
