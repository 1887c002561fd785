"""LXMERT cross-modality layer golden parity vs the PyTorch reference
(mmf/models/lxmert.py:233-292): shared cross-attention applied in both
directions, per-stream self-attention, per-stream FFNs — with converted
weights on identical inputs, including padded positions."""

import os

import numpy as np
import pytest

from mmf_tpu.utils.checkpoint_updater import convert_torch_state_dict

pytestmark = pytest.mark.skipif(
    not os.path.isdir("/root/reference/mmf"),
    reason="reference checkout not mounted",
)

ATOL = 2e-5

LXMERT_XLAYER_KEY_MAP = {
    r"^visual_attention\.att\.": "visual_attention.",
    r"^visual_attention\.output\.dense": "visual_attention.output_dense",
    r"^visual_attention\.output\.LayerNorm": "visual_attention.output_ln",
    r"\.self\.": ".",
    r"^(lang|visn)_self_att\.output\.dense": r"\1_self_att.output_dense",
    r"^(lang|visn)_self_att\.output\.LayerNorm":
        r"\1_self_att.output_layer_norm",
    r"^(lang|visn)_inter\.dense": r"\1_ffn.intermediate_dense",
    r"^(lang|visn)_output\.dense": r"\1_ffn.output_dense",
    r"^(lang|visn)_output\.LayerNorm": r"\1_ffn.output_layer_norm",
}


@pytest.fixture(scope="module")
def ref_lxmert():
    from tests.reference_parity import shims

    shims.install()
    import mmf.models.lxmert as ref_lxmert_mod

    yield ref_lxmert_mod
    shims.uninstall()


def test_lxmert_x_layer_parity(ref_lxmert):
    import jax
    import torch
    from transformers import BertConfig

    from mmf_tpu.models.lxmert import LXMERTXLayer
    from mmf_tpu.modules.transformer import TransformerConfig

    torch.manual_seed(7)
    H = 24
    bert_config = BertConfig(
        hidden_size=H, num_attention_heads=4, intermediate_size=48,
        hidden_act="gelu", hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0, layer_norm_eps=1e-12,
    )
    # direct BertConfig construction leaves _attn_implementation unset in
    # this transformers version; HF's model loaders normally set it
    bert_config._attn_implementation = "eager"
    tlayer = ref_lxmert.LXMERTXLayer(bert_config).eval()

    # The installed transformers dropped encoder_hidden_states/
    # encoder_attention_mask from BertSelfAttention.forward (the API the
    # reference was written against, lxmert.py:75-84). Recreate the exact
    # old-style cross-attention with the module's own weights so the
    # reference layer runs unmodified otherwise.
    import math
    import types

    def patched_cross_forward(self, input_tensor, ctx_tensor,
                              ctx_att_mask=None):
        att = self.att
        h, d = att.num_attention_heads, att.attention_head_size

        def split(x):
            b, s, _ = x.shape
            return x.view(b, s, h, d).permute(0, 2, 1, 3)

        q = split(att.query(input_tensor))
        k = split(att.key(ctx_tensor))
        v = split(att.value(ctx_tensor))
        scores = q @ k.transpose(-1, -2) / math.sqrt(d)
        if ctx_att_mask is not None:
            scores = scores + ctx_att_mask
        probs = torch.softmax(scores, dim=-1)
        ctx = (probs @ v).permute(0, 2, 1, 3).reshape(input_tensor.shape)
        return self.output(ctx, input_tensor)

    tlayer.visual_attention.forward = types.MethodType(
        patched_cross_forward, tlayer.visual_attention
    )

    cfg = TransformerConfig(
        hidden_size=H, num_attention_heads=4, intermediate_size=48,
        hidden_act="gelu", hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0, layer_norm_eps=1e-12,
    )
    jlayer = LXMERTXLayer(cfg)

    B, SL, SV = 2, 6, 4
    rng = np.random.RandomState(7)
    lang = rng.randn(B, SL, H).astype(np.float32)
    visn = rng.randn(B, SV, H).astype(np.float32)
    lang_mask = np.ones((B, SL), np.float32)
    lang_mask[1, -2:] = 0  # padded text positions
    visn_mask = np.ones((B, SV), np.float32)
    visn_mask[0, -1] = 0  # padded region

    def extended(m):  # HF-style additive mask
        return ((1.0 - m) * -10000.0)[:, None, None, :]

    with torch.no_grad():
        t_lang, t_visn = tlayer(
            torch.from_numpy(lang),
            torch.from_numpy(extended(lang_mask)),
            torch.from_numpy(visn),
            torch.from_numpy(extended(visn_mask)),
        )

    from mmf_tpu.ops.attention import make_attention_bias

    lang_bias = make_attention_bias(lang_mask)
    visn_bias = make_attention_bias(visn_mask)
    params = jlayer.init(
        jax.random.PRNGKey(0), lang, lang_bias, visn, visn_bias
    )
    sd = {k: v.detach().numpy() for k, v in tlayer.state_dict().items()}
    converted, stats = convert_torch_state_dict(
        sd, params["params"], key_map=LXMERT_XLAYER_KEY_MAP
    )
    assert stats["shape_mismatch"] == 0, stats
    assert stats["missed"] == 0, stats

    j_lang, j_visn = jlayer.apply(
        {"params": converted}, lang, lang_bias, visn, visn_bias
    )
    np.testing.assert_allclose(np.asarray(j_lang), t_lang.numpy(), atol=ATOL)
    np.testing.assert_allclose(np.asarray(j_visn), t_visn.numpy(), atol=ATOL)


def test_lxmert_visual_feat_encoder_parity(ref_lxmert):
    """(reference lxmert.py:201-232): feat+box projections, LN each, mean."""
    import jax
    import torch
    from transformers import BertConfig

    from mmf_tpu.models.lxmert import VisualFeatEncoder
    from mmf_tpu.modules.transformer import TransformerConfig

    torch.manual_seed(9)
    H, FD, PD = 24, 16, 4
    bert_config = BertConfig(hidden_size=H, hidden_dropout_prob=0.0)
    bert_config.visual_feat_dim = FD
    bert_config.visual_pos_dim = PD
    tenc = ref_lxmert.VisualFeatEncoder(bert_config).eval()

    cfg = TransformerConfig(hidden_size=H, hidden_dropout_prob=0.0)
    jenc = VisualFeatEncoder(cfg, visual_feat_dim=FD, visual_pos_dim=PD)

    B, R = 2, 5
    rng = np.random.RandomState(9)
    feats = rng.randn(B, R, FD).astype(np.float32)
    boxes = rng.rand(B, R, PD).astype(np.float32)

    with torch.no_grad():
        t_out = tenc((torch.from_numpy(feats), torch.from_numpy(boxes)))

    params = jenc.init(jax.random.PRNGKey(0), feats, boxes)
    sd = {k: v.detach().numpy() for k, v in tenc.state_dict().items()}
    converted, stats = convert_torch_state_dict(
        sd, params["params"],
        key_map={
            r"^visn_fc": "visn_fc",
            r"^visn_layer_norm": "visn_ln",
            r"^box_fc": "box_fc",
            r"^box_layer_norm": "box_ln",
        },
    )
    assert stats["shape_mismatch"] == 0, stats
    j_out = jenc.apply({"params": converted}, feats, boxes)
    np.testing.assert_allclose(np.asarray(j_out), t_out.numpy(), atol=ATOL)
