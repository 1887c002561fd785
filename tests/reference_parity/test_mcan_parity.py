"""MoVie+MCAN attention-block golden parity vs the torch reference
(mmf/modules/attention.py SelfAttention / SelfGuidedAttention)."""

import os

import numpy as np
import pytest

from mmf_tpu.utils.checkpoint_updater import convert_torch_state_dict
from mmf_tpu.utils.env import setup_imports

setup_imports()

pytestmark = pytest.mark.skipif(
    not os.path.isdir("/root/reference/mmf"),
    reason="reference checkout not mounted",
)

ATOL = 2e-5


@pytest.fixture(scope="module")
def ref():
    from tests.reference_parity import shims

    shims.install()
    import mmf.modules.attention as ref_attention

    yield ref_attention
    shims.uninstall()


SA_KEY_MAP = {
    r"^multi_head_attn\.linears\.0": "mhatt.q_lin",
    r"^multi_head_attn\.linears\.1": "mhatt.k_lin",
    r"^multi_head_attn\.linears\.2": "mhatt.v_lin",
    r"^multi_head_attn\.linears\.3": "mhatt.out_lin",
    r"^fcn\.0": "ffn.fc",
    r"^fcn\.3": "ffn.out",
    r"^ln_mha": "ln1",
    r"^ln_fcn": "ln2",
}

SGA_KEY_MAP = {
    r"^multi_head_attn\.0\.linears\.0": "mhatt1.q_lin",
    r"^multi_head_attn\.0\.linears\.1": "mhatt1.k_lin",
    r"^multi_head_attn\.0\.linears\.2": "mhatt1.v_lin",
    r"^multi_head_attn\.0\.linears\.3": "mhatt1.out_lin",
    r"^multi_head_attn\.1\.linears\.0": "mhatt2.q_lin",
    r"^multi_head_attn\.1\.linears\.1": "mhatt2.k_lin",
    r"^multi_head_attn\.1\.linears\.2": "mhatt2.v_lin",
    r"^multi_head_attn\.1\.linears\.3": "mhatt2.out_lin",
    r"^fcn\.0": "ffn.fc",
    r"^fcn\.3": "ffn.out",
    r"^ln_mha\.0": "ln1",
    r"^ln_mha\.1": "ln2",
    r"^ln_fcn": "ln3",
}


def test_mcan_self_attention_parity(ref):
    import jax
    import torch

    from mmf_tpu.modules.attention import SelfAttention

    torch.manual_seed(11)
    D, H = 16, 4
    tmod = ref.SelfAttention(D, H, dropout=0.0).eval()
    jmod = SelfAttention(dim=D, num_attn=H, dropout=0.0)

    B, T = 2, 6
    rng = np.random.RandomState(11)
    x = rng.randn(B, T, D).astype(np.float32)
    mask = np.zeros((B, T), bool)
    mask[1, -2:] = True  # True = masked

    with torch.no_grad():
        t_out = tmod(torch.from_numpy(x), torch.from_numpy(mask))

    params = jmod.init(jax.random.PRNGKey(0), x, mask)
    sd = {k: v.detach().numpy() for k, v in tmod.state_dict().items()}
    converted, stats = convert_torch_state_dict(
        sd, params["params"], key_map=SA_KEY_MAP
    )
    assert stats["missed"] == 0 and stats["shape_mismatch"] == 0, stats
    j_out = jmod.apply({"params": converted}, x, mask)
    np.testing.assert_allclose(np.asarray(j_out), t_out.numpy(), atol=ATOL)


def test_mcan_self_guided_attention_parity(ref):
    import jax
    import torch

    from mmf_tpu.modules.attention import SelfGuidedAttention

    torch.manual_seed(12)
    D, H = 16, 4
    tmod = ref.SelfGuidedAttention(D, H, dropout=0.0).eval()
    jmod = SelfGuidedAttention(dim=D, num_attn=H, dropout=0.0)

    B, TX, TY = 2, 5, 7
    rng = np.random.RandomState(12)
    x = rng.randn(B, TX, D).astype(np.float32)
    y = rng.randn(B, TY, D).astype(np.float32)
    x_mask = np.zeros((B, TX), bool)
    y_mask = np.zeros((B, TY), bool)
    x_mask[0, -1] = True
    y_mask[1, -3:] = True

    with torch.no_grad():
        t_out = tmod(torch.from_numpy(x), torch.from_numpy(y),
                     torch.from_numpy(x_mask), torch.from_numpy(y_mask))

    params = jmod.init(jax.random.PRNGKey(0), x, y, x_mask, y_mask)
    sd = {k: v.detach().numpy() for k, v in tmod.state_dict().items()}
    # the reference's ln_mha[2] is constructed but never used
    sd = {k: v for k, v in sd.items() if not k.startswith("ln_mha.2")}
    converted, stats = convert_torch_state_dict(
        sd, params["params"], key_map=SGA_KEY_MAP
    )
    assert stats["missed"] == 0 and stats["shape_mismatch"] == 0, stats
    j_out = jmod.apply({"params": converted}, x, y, x_mask, y_mask)
    np.testing.assert_allclose(np.asarray(j_out), t_out.numpy(), atol=ATOL)
