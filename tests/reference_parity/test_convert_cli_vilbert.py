"""End-to-end zoo conversion: a REAL reference ViLBERT trunk's torch
state_dict goes through the convert_checkpoint CLI (model=vilbert) and the
resulting orbax params reproduce the reference trunk's outputs."""

import os
import subprocess
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.skipif(
    not os.path.isdir("/root/reference/mmf"),
    reason="reference checkout not mounted",
)

SMALL = dict(
    vocab_size=80, hidden_size=16, num_hidden_layers=4,
    num_attention_heads=4, intermediate_size=32,
    max_position_embeddings=30, type_vocab_size=2,
    hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
    v_feature_size=12, v_hidden_size=20, v_num_hidden_layers=3,
    v_num_attention_heads=4, v_intermediate_size=40,
    v_attention_probs_dropout_prob=0.0, v_hidden_dropout_prob=0.0,
    v_hidden_act="gelu", bi_hidden_size=24, bi_num_attention_heads=4,
    v_biattention_id=[1, 2], t_biattention_id=[2, 3],
    fixed_t_layer=0, fixed_v_layer=0, fast_mode=False,
    with_coattention=True, dynamic_attention=False,
    in_batch_pairs=False, visualization=False,
    task_specific_tokens=False, visual_target=0,
)


def test_convert_cli_roundtrips_reference_vilbert(tmp_path):
    import torch
    from transformers import BertConfig

    from tests.reference_parity import shims

    shims.install()
    try:
        import mmf.models.vilbert as ref_vilbert

        ref_vilbert.replace_with_jit = lambda *a, **k: None
        torch.manual_seed(20)
        bert_config = BertConfig(**{
            k: v for k, v in SMALL.items()
            if k in ("vocab_size", "hidden_size", "num_hidden_layers",
                     "num_attention_heads", "intermediate_size",
                     "max_position_embeddings", "type_vocab_size",
                     "hidden_dropout_prob", "attention_probs_dropout_prob")
        })
        for k, v in SMALL.items():
            setattr(bert_config, k, v)
        tmodel = ref_vilbert.ViLBERTBase(bert_config).eval()

        rng = np.random.RandomState(20)
        B, S, R = 2, 7, 5
        input_ids = rng.randint(0, 80, (B, S))
        image_feature = rng.randn(B, R, 12).astype(np.float32)
        image_location = rng.rand(B, R, 5).astype(np.float32)
        with torch.no_grad():
            t_out = tmodel(
                torch.from_numpy(input_ids),
                torch.from_numpy(image_feature),
                torch.from_numpy(image_location),
            )
        t_seq_t, t_seq_v = t_out[0].numpy(), t_out[1].numpy()

        # MMF checkpoints carry the trunk under "model."
        ckpt = tmp_path / "vilbert_ref.pth"
        torch.save(
            {"model": {f"model.bert.{k}": v  # zoo layout: wrapper.model.bert.*
                       for k, v in tmodel.state_dict().items()}},
            str(ckpt),
        )
    finally:
        shims.uninstall()

    config_yaml = tmp_path / "small_vilbert.yaml"
    lines = ["model_config:", "  vilbert:",
             "    training_head_type: classification",
             "    num_labels: 2", "    dtype: float32"]
    for k, v in SMALL.items():
        if isinstance(v, list):
            lines.append(f"    {k}: [{', '.join(map(str, v))}]")
        elif isinstance(v, bool):
            lines.append(f"    {k}: {str(v).lower()}")
        else:
            lines.append(f"    {k}: {v}")
    config_yaml.write_text("\n".join(lines) + "\n")

    out_dir = str(tmp_path / "converted.ckpt")
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    subprocess.check_call(
        [sys.executable, "tools/scripts/convert_checkpoint.py",
         "--torch_checkpoint", str(ckpt), "--model", "vilbert",
         "--dataset", "vqa2", "--output", out_dir,
         "--config", str(config_yaml),
         "--seq_len", "7", "--regions", "5", "--vdim", "12"],
        env=env,
    )

    # load converted params and run our trunk
    import jax

    from mmf_tpu.models.vilbert import ViLBertBase
    from mmf_tpu.utils.checkpoint import _checkpointer

    restored = _checkpointer().restore(out_dir)
    params = restored["variables"]["params"]["bert"]

    jmodel = ViLBertBase(dict(SMALL))
    token_type_ids = np.zeros((B, S), np.int64)
    attention_mask = np.ones((B, S), np.float32)
    image_mask = np.ones((B, R), np.float32)
    j_txt, j_img, _, _ = jmodel.apply(
        {"params": params}, input_ids, image_feature, image_location,
        token_type_ids, attention_mask, image_mask,
    )
    np.testing.assert_allclose(np.asarray(j_txt), t_seq_t, atol=2e-5)
    np.testing.assert_allclose(np.asarray(j_img), t_seq_v, atol=2e-5)
