"""Golden parity: the reference's vendored timm-style ALBEF
VisionTransformer (mmf/models/albef/vit.py:522-667) vs our shared pre-LN
ViT trunk with converted weights (fused qkv split + timm key map)."""

import os

import numpy as np
import pytest

pytestmark = pytest.mark.skipif(
    not os.path.isdir("/root/reference/mmf"),
    reason="reference checkout not mounted",
)

ATOL = 2e-5


@pytest.fixture(scope="module")
def ref_vit():
    from tests.reference_parity import shims

    shims.install()
    from mmf.models.albef.vit import VisionTransformer

    yield VisionTransformer
    shims.uninstall()


def test_albef_vision_transformer_parity(ref_vit):
    import jax
    import torch
    from omegaconf import OmegaConf

    from mmf_tpu.modules.vit import ViTModel
    from mmf_tpu.utils.checkpoint_updater import (
        TIMM_VIT_KEY_MAP,
        convert_torch_state_dict,
        split_timm_qkv,
    )

    torch.manual_seed(0)
    cfg = OmegaConf.create(
        {
            "img_size": 16,
            "patch_size": 4,
            "embed_dim": 24,
            "depth": 2,
            "num_heads": 4,
            "mlp_ratio": 2.0,
            "qkv_bias": True,
            "drop_rate": 0.0,
            "attn_drop_rate": 0.0,
        }
    )
    tmodel = ref_vit(cfg).eval()
    # non-degenerate weights: default init leaves LN at identity only,
    # which is fine; perturb cls/pos so the concat path is exercised
    with torch.no_grad():
        tmodel.cls_token.normal_(0, 0.5)
        tmodel.pos_embed.normal_(0, 0.5)

    jmodel = ViTModel(
        hidden_size=24,
        num_hidden_layers=2,
        num_attention_heads=4,
        intermediate_size=48,
        patch_size=4,
        image_size=16,
        layer_norm_eps=1e-6,
        add_pooling_layer=False,
    )

    rng = np.random.RandomState(0)
    images = rng.randn(2, 3, 16, 16).astype(np.float32)

    with torch.no_grad():
        t_out = tmodel(torch.from_numpy(images)).numpy()

    params = jmodel.init(jax.random.PRNGKey(0), images)
    sd = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}
    converted, stats = convert_torch_state_dict(
        split_timm_qkv(sd), params["params"], key_map=TIMM_VIT_KEY_MAP
    )
    assert stats["shape_mismatch"] == 0
    assert stats["missed"] == 0
    # 4 embedding leaves + 16 per block x 2 + 2 final norm
    assert stats["matched"] == 4 + 32 + 2

    j_out, _ = jmodel.apply({"params": converted}, images)
    np.testing.assert_allclose(np.asarray(j_out), t_out, atol=ATOL)


def test_albef_encoder_runs_with_reference_param_names():
    """The registered albef_vit_encoder accepts the reference's timm
    parameter names through the encoder factory (vit.py:550-563)."""
    import jax

    from mmf_tpu.modules.encoders import build_image_encoder
    from mmf_tpu.utils.env import setup_imports

    setup_imports()

    enc = build_image_encoder(
        {
            "type": "albef_vit_encoder",
            "params": {
                "embed_dim": 24,
                "depth": 1,
                "num_heads": 4,
                "mlp_ratio": 2.0,
                "img_size": 16,
                "patch_size": 4,
            },
        }
    )
    x = np.zeros((2, 3, 16, 16), np.float32)
    variables = enc.init(jax.random.PRNGKey(0), x)
    out = enc.apply(variables, x)
    assert out.shape == (2, (16 // 4) ** 2 + 1, 24)
