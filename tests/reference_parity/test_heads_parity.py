"""Transformer pretraining heads golden parity vs the PyTorch reference
(mmf/models/transformers/heads/): ITM (pooler + NSP linear + masked CE)
and MRC (region classifier + KL) with converted weights on identical
inputs."""

import os

import numpy as np
import pytest

from mmf_tpu.utils.checkpoint_updater import convert_torch_state_dict

pytestmark = pytest.mark.skipif(
    not os.path.isdir("/root/reference/mmf"),
    reason="reference checkout not mounted",
)

ATOL = 2e-5


@pytest.fixture(scope="module")
def ref_heads():
    from tests.reference_parity import shims

    shims.install()
    import mmf.models.transformers.heads.itm as ref_itm
    import mmf.models.transformers.heads.mrc as ref_mrc

    yield {"itm": ref_itm, "mrc": ref_mrc}
    shims.uninstall()


def test_itm_head_parity(ref_heads):
    import jax
    import torch
    from omegaconf import OmegaConf

    from mmf_tpu.models.transformers.heads.heads import ITM

    torch.manual_seed(21)
    H = 24
    t_head = ref_heads["itm"].ITM(
        OmegaConf.create({"type": "itm", "hidden_size": H,
                          "loss_name": "itm_loss", "ignore_index": -1,
                          "itm_label_key": "is_correct"})
    ).eval()

    B, S = 4, 6
    rng = np.random.RandomState(21)
    seq = rng.randn(B, S, H).astype(np.float32)
    labels = np.asarray([1, 0, 1, -1])  # one ignored row

    with torch.no_grad():
        t_out = t_head(
            torch.from_numpy(seq),
            processed_sample_list={
                "is_correct": torch.from_numpy(labels)
            },
        )
    t_loss = float(t_out["losses"]["itm_loss"])

    j_head = ITM(config={"hidden_size": H})
    sl = {"is_correct": labels}
    params = j_head.init(jax.random.PRNGKey(0), seq,
                         processed_sample_list=sl)
    sd = {k: v.detach().numpy() for k, v in t_head.state_dict().items()}
    converted, stats = convert_torch_state_dict(
        sd, params["params"],
        key_map={
            r"^pooler\.dense": "pooler.dense",
            r"^cls\.seq_relationship": "seq_relationship",
        },
    )
    assert stats["shape_mismatch"] == 0, stats
    j_out = j_head.apply({"params": converted}, seq,
                         processed_sample_list=sl)
    j_loss = float(j_out["losses"]["itm_loss"])
    np.testing.assert_allclose(j_loss, t_loss, atol=ATOL)


def test_mrc_head_kl_parity(ref_heads):
    """Our MRC consumes mask+span layout; the reference gathers masked
    rows first. Feed both the same masked-region setup and compare the KL
    loss value."""
    import jax
    import torch

    from mmf_tpu.models.transformers.heads.heads import MRC

    torch.manual_seed(23)
    H, C = 24, 10
    t_head = ref_heads["mrc"].MRC(
        hidden_size=H, label_dim=C, use_kl=True
    ).eval()

    B, R = 2, 5
    rng = np.random.RandomState(23)
    img_hidden = rng.randn(B, R, H).astype(np.float32)
    is_masked = np.zeros((B, R), bool)
    is_masked[0, 1] = True
    is_masked[1, 3] = True
    soft = rng.rand(B, R, C).astype(np.float32)
    soft = soft / soft.sum(-1, keepdims=True)

    # reference: gather masked rows, classify, KL(batchmean over rows)
    with torch.no_grad():
        t_out = t_head(
            torch.from_numpy(img_hidden),
            processed_sample_list={
                "region_class": torch.from_numpy(
                    soft[is_masked]
                ),
                "image_region_mask": torch.from_numpy(is_masked),
            },
        )
    t_loss = float(t_out["losses"]["mrc_loss"])

    j_head = MRC(config={"hidden_size": H})
    sl = {"mrc_labels": {"targets": soft, "is_masked": is_masked}}
    params = j_head.init(jax.random.PRNGKey(0), img_hidden,
                         processed_sample_list=sl)
    # reference classifier: Sequential(Linear, GELU, LayerNorm, Linear) ->
    # ours: PredictionHeadTransform(dense+act+LN) + decoder
    sd = {k: v.detach().numpy() for k, v in t_head.state_dict().items()}
    converted, stats = convert_torch_state_dict(
        sd, params["params"],
        key_map={
            r"^region_classifier\.0": "transform.dense",
            r"^region_classifier\.2": "transform.layer_norm",
            r"^region_classifier\.3": "decoder",
        },
    )
    assert stats["shape_mismatch"] == 0, stats
    j_out = j_head.apply({"params": converted}, img_hidden,
                         processed_sample_list=sl)
    j_loss = float(j_out["losses"]["mrc_loss"])
    np.testing.assert_allclose(j_loss, t_loss, atol=ATOL)
