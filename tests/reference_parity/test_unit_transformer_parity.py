"""Golden parity: the reference UniT/DETR transformer
(mmf/models/unit/transformer.py:80-236 UniTTransformer) vs our
UniTTransformerCore with converted weights — the full orchestration:
image-only encoder with per-layer sine pos, post-encoder text concat,
zero-initialized decoder targets with per-layer query embeddings,
final decoder norm over every intermediate state, enc->dec projections,
residual_in_encoder, and the task-embedding encoder prefix."""

import os
import types

import numpy as np
import pytest

pytestmark = pytest.mark.skipif(
    not os.path.isdir("/root/reference/mmf"),
    reason="reference checkout not mounted",
)

ATOL = 2e-5


@pytest.fixture(scope="module")
def ref_transformer():
    from tests.reference_parity import shims

    shims.install()
    from mmf.models.unit.transformer import UniTTransformer

    yield UniTTransformer
    shims.uninstall()


def _args(**over):
    base = dict(
        encoder_hidden_dim=32,
        decoder_hidden_dim=32,
        dropout=0.0,
        nheads=4,
        dim_feedforward=64,
        enc_layers=2,
        dec_layers=2,
        pre_norm=False,
        pass_pos_and_query=True,
        share_decoders=False,
        num_queries={"vl": {"vqa2": 5}},
        use_task_embedding_in_img_encoder=False,
        residual_in_encoder=False,
    )
    base.update(over)
    return types.SimpleNamespace(**base)


def _split_mha(sd):
    """torch MultiheadAttention in_proj (fused [3D, D]) -> q/k/v entries;
    out_proj -> out."""
    out = {}
    for key, val in sd.items():
        arr = val.detach().numpy()
        if key.endswith("in_proj_weight") or key.endswith("in_proj_bias"):
            leaf = "weight" if key.endswith("weight") else "bias"
            stem = key.rsplit(".", 1)[0]
            q, k, v = np.split(arr, 3, axis=0)
            for name, part in (("q", q), ("k", k), ("v", v)):
                out[f"{stem}.{name}.{leaf}"] = part
        elif ".out_proj." in key:
            out[key.replace(".out_proj.", ".out.")] = arr
        else:
            out[key] = arr
    return out


def _key_map(task, dataset):
    return {
        r"^encoder\.layers\.(\d+)\.": r"encoder.layers_\1.",
        rf"^decoders\.{task}\.{dataset}\.layers\.(\d+)\.":
            rf"decoder_{task}_{dataset}.layers_\1.",
        rf"^decoders\.{task}\.{dataset}\.norm\.":
            rf"decoder_{task}_{dataset}.norm.",
        r"^task_embeddings_enc\.weight$": "task_embeddings_enc",
    }


def _run_pair(ref_cls, args, img=True, task_embedding=False):
    import jax
    import torch

    from mmf_tpu.models.unit.transformer import UniTTransformerCore
    from mmf_tpu.utils.checkpoint_updater import convert_torch_state_dict

    torch.manual_seed(0)
    tmodel = ref_cls(args).eval()

    B, H, W, T, Q = 2, 2, 3, 4, 5
    De, Dd = args.encoder_hidden_dim, args.decoder_hidden_dim
    rng = np.random.RandomState(0)
    img_map = rng.randn(B, De, H, W).astype(np.float32)
    img_pos_map = rng.randn(1, De, H, W).astype(np.float32)
    text_src = rng.randn(B, T, Dd).astype(np.float32)
    text_pos = rng.randn(T, Dd).astype(np.float32)
    text_mask = np.ones((B, T), np.int64)
    text_mask[1, -1] = 0  # one pad token
    query_embed = rng.randn(Q, Dd).astype(np.float32)

    with torch.no_grad():
        t_hs, _ = tmodel(
            img_src=torch.from_numpy(img_map) if img else None,
            img_mask=torch.zeros(B, H, W, dtype=torch.bool) if img else None,
            img_pos=torch.from_numpy(
                np.broadcast_to(img_pos_map, (B, De, H, W)).copy()
            ) if img else None,
            text_src=torch.from_numpy(text_src),
            text_mask=torch.from_numpy(text_mask),
            text_pos=torch.from_numpy(text_pos),
            query_embed=torch.from_numpy(query_embed),
            task_type="vl",
            dataset_name="vqa2",
            task_idx=3,
        )
    t_hs = t_hs.numpy()  # [L, B, Q, Dd] (after transpose(1, 2))

    jmodel = UniTTransformerCore(
        d_model_enc=De,
        d_model_dec=Dd,
        nheads=args.nheads,
        dim_feedforward=args.dim_feedforward,
        num_encoder_layers=args.enc_layers,
        num_decoder_layers=args.dec_layers,
        dropout=0.0,
        pre_norm=args.pre_norm,
        pass_pos_and_query=args.pass_pos_and_query,
        residual_in_encoder=args.residual_in_encoder,
        share_decoders=args.share_decoders,
        use_task_embedding_in_img_encoder=(
            args.use_task_embedding_in_img_encoder
        ),
        decoder_index={"vl": ["vqa2"]},
    )
    # [B, C, H, W] conv maps -> [B, HW, C] token layout
    img_tokens = img_map.reshape(B, De, H * W).transpose(0, 2, 1)
    img_pos_tok = img_pos_map.reshape(1, De, H * W).transpose(0, 2, 1)
    kwargs = dict(
        img_src=img_tokens if img else None,
        img_mask=np.ones((B, H * W), np.int32) if img else None,
        img_pos=img_pos_tok if img else None,
        text_src=text_src,
        text_mask=text_mask.astype(np.int32),
        text_pos=text_pos[None],
        query_embed=query_embed,
        task_type="vl",
        dataset_name="vqa2",
        task_idx=3,
    )
    params = jmodel.init(jax.random.PRNGKey(0), **kwargs)

    converted, stats = convert_torch_state_dict(
        _split_mha(tmodel.state_dict()),
        params["params"],
        key_map=_key_map("vl", "vqa2"),
    )
    assert stats["shape_mismatch"] == 0
    if img:
        assert stats["missed"] == 0
    else:
        # text-only: the torch model still owns (unused) encoder weights;
        # our functional core only materializes what the forward touches
        assert stats["missed"] == args.enc_layers * 16

    j_hs, _ = jmodel.apply({"params": converted}, **kwargs)
    np.testing.assert_allclose(np.asarray(j_hs), t_hs, atol=ATOL)
    return stats


def test_unit_transformer_vl_parity(ref_transformer):
    """Image + text memory, equal encoder/decoder dims."""
    stats = _run_pair(ref_transformer, _args())
    # 2 enc layers x 16 + 2 dec layers x 26 + dec final norm x 2
    assert stats["matched"] == 2 * 16 + 2 * 26 + 2


def test_unit_transformer_projections_and_residual_parity(ref_transformer):
    """decoder dim != encoder dim (enc2dec + pos projections), residual
    encoder output, and the task-embedding token prefixed to the encoder
    (transformer.py:45-50, 178, 218-235)."""
    args = _args(
        decoder_hidden_dim=24,
        residual_in_encoder=True,
        use_task_embedding_in_img_encoder=True,
    )
    _run_pair(ref_transformer, args, task_embedding=True)


def test_unit_transformer_pre_norm_parity(ref_transformer):
    """normalize_before=True variant (forward_pre paths + encoder final
    norm)."""
    _run_pair(ref_transformer, _args(pre_norm=True))


def test_unit_transformer_text_only_parity(ref_transformer):
    """GLUE-style: no image branch, text memory only."""
    _run_pair(ref_transformer, _args(), img=False)
