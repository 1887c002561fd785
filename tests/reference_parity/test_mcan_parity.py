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


TB_KEY_MAP = {
    r"^sga\.self_guided_attns\.(\d+)\.multi_head_attn\.0\.linears\.0":
        r"sga.sga_\1.mhatt1.q_lin",
    r"^sga\.self_guided_attns\.(\d+)\.multi_head_attn\.0\.linears\.1":
        r"sga.sga_\1.mhatt1.k_lin",
    r"^sga\.self_guided_attns\.(\d+)\.multi_head_attn\.0\.linears\.2":
        r"sga.sga_\1.mhatt1.v_lin",
    r"^sga\.self_guided_attns\.(\d+)\.multi_head_attn\.0\.linears\.3":
        r"sga.sga_\1.mhatt1.out_lin",
    r"^sga\.self_guided_attns\.(\d+)\.multi_head_attn\.1\.linears\.0":
        r"sga.sga_\1.mhatt2.q_lin",
    r"^sga\.self_guided_attns\.(\d+)\.multi_head_attn\.1\.linears\.1":
        r"sga.sga_\1.mhatt2.k_lin",
    r"^sga\.self_guided_attns\.(\d+)\.multi_head_attn\.1\.linears\.2":
        r"sga.sga_\1.mhatt2.v_lin",
    r"^sga\.self_guided_attns\.(\d+)\.multi_head_attn\.1\.linears\.3":
        r"sga.sga_\1.mhatt2.out_lin",
    r"^sga\.self_guided_attns\.(\d+)\.fcn\.0": r"sga.sga_\1.ffn.fc",
    r"^sga\.self_guided_attns\.(\d+)\.fcn\.3": r"sga.sga_\1.ffn.out",
    r"^sga\.self_guided_attns\.(\d+)\.ln_mha\.0": r"sga.sga_\1.ln1",
    r"^sga\.self_guided_attns\.(\d+)\.ln_mha\.1": r"sga.sga_\1.ln2",
    r"^sga\.self_guided_attns\.(\d+)\.ln_fcn": r"sga.sga_\1.ln3",
    r"^sga_pool\.linear\.0": "sga_pool.lin1",
    r"^sga_pool\.linear\.3": "sga_pool.lin2",
    r"^cbn\.cbns\.(\d+)\.": r"cbn.cbn_\1.",
    r"(cbn_\d+)\.se\.se\.1": r"\1.se.se_fc1",
    r"(cbn_\d+)\.se\.se\.3": r"\1.se.se_fc2",
    r"(cbn_\d+)\.se\.attn\.1": r"\1.se.attn_conv",
}


def test_two_branch_embedding_parity(ref):
    """TwoBranchEmbedding (reference embeddings.py:599-624): the full
    MoVie+MCAN image branch — SGA stack + attention pool and the
    conditional-batchnorm MovieBottleneck chain (modulation, frozen BN,
    squeeze-excitation, downsample) with converted weights."""
    import jax
    import torch

    from tests.reference_parity import shims  # noqa: F401  (installed)
    import mmf.modules.embeddings as ref_emb

    from mmf_tpu.modules.embeddings import TwoBranchEmbedding

    torch.manual_seed(13)
    EMB, HID, COND, ATT, L, CBN_L = 32, 16, 12, 4, 2, 2
    tmod = ref_emb.TwoBranchEmbedding(
        EMB, hidden_dim=HID, num_attn=ATT, num_layers=L, dropout=0.0,
        cond_dim=COND, cbn_num_layers=CBN_L,
    ).eval()
    # FrozenBatchNorm stats default to identity; randomize them so the BN
    # math is actually checked
    with torch.no_grad():
        for name, buf in tmod.named_buffers():
            if "running_mean" in name:
                buf.normal_(0, 0.2)
            if "running_var" in name:
                buf.uniform_(0.5, 1.5)

    B, HH, WW, TY = 2, 3, 3, 4
    rng = np.random.RandomState(13)
    x = rng.randn(B, EMB, HH, WW).astype(np.float32)  # conv feature map
    y = rng.randn(B, TY, HID).astype(np.float32)      # question states
    v = rng.randn(B, COND).astype(np.float32)         # question vector
    x_mask = np.zeros((B, HH * WW), bool)
    y_mask = np.zeros((B, TY), bool)
    y_mask[1, -1] = True

    with torch.no_grad():
        t_sga, t_cbn = tmod(
            torch.from_numpy(x), torch.from_numpy(y), torch.from_numpy(v),
            torch.from_numpy(x_mask), torch.from_numpy(y_mask),
        )

    jmod = TwoBranchEmbedding(
        embedding_dim=EMB, cond_dim=COND, hidden_dim=HID, num_attn=ATT,
        num_layers=L, dropout=0.0, cbn_num_layers=CBN_L,
    )
    params = jmod.init(jax.random.PRNGKey(0), x, y, v, x_mask, y_mask)
    sd = {k: t.detach().numpy() for k, t in tmod.state_dict().items()
          if not k.endswith("num_batches_tracked")
          and ".ln_mha.2" not in k}
    converted, stats = convert_torch_state_dict(
        sd, params["params"], key_map=TB_KEY_MAP
    )
    assert stats["missed"] == 0 and stats["shape_mismatch"] == 0, stats
    j_sga, j_cbn = jmod.apply({"params": converted}, x, y, v, x_mask, y_mask)
    np.testing.assert_allclose(np.asarray(j_sga), t_sga.numpy(), atol=ATOL)
    np.testing.assert_allclose(np.asarray(j_cbn), t_cbn.numpy(), atol=ATOL)


def test_sa_embedding_parity(ref):
    """SAEmbedding (reference embeddings.py:462-502): LSTM + self-attn
    stack + attention pooling, with converted LSTM weights."""
    import jax
    import torch

    import mmf.modules.embeddings as ref_emb

    from mmf_tpu.modules.embeddings import SAEmbedding
    from mmf_tpu.utils.checkpoint_updater import convert_torch_lstm_weights

    torch.manual_seed(14)
    EMB, HID, ATT, L, NF = 12, 16, 4, 2, 2
    tmod = ref_emb.SAEmbedding(
        HID, EMB, num_attn=ATT, num_layers=L, dropout=0.0,
        num_attn_pool=1, num_feat=NF,
    ).eval()

    B, T = 2, 5
    rng = np.random.RandomState(14)
    x = rng.randn(B, T, EMB).astype(np.float32)
    mask = np.zeros((B, T), bool)
    mask[0, -1] = True

    with torch.no_grad():
        t_out, t_vec = tmod(torch.from_numpy(x), torch.from_numpy(mask))

    jmod = SAEmbedding(
        hidden_dim=HID, embedding_dim=EMB, num_attn=ATT, num_layers=L,
        dropout=0.0, num_attn_pool=1, num_feat=NF,
    )
    params = jax.tree_util.tree_map(
        np.asarray, jmod.init(jax.random.PRNGKey(0), x, mask)
    )["params"]
    sd = {k: t.detach().numpy() for k, t in tmod.state_dict().items()}

    # locate the RNN cell subtree (it holds the per-gate hf/hi/... denses)
    cell_key = next(k for k, v_ in params.items()
                    if isinstance(v_, dict) and "hf" in v_)
    params[cell_key] = convert_torch_lstm_weights(
        sd["lstm.weight_ih_l0"], sd["lstm.weight_hh_l0"],
        sd["lstm.bias_ih_l0"], sd["lstm.bias_hh_l0"],
    )
    lin_sd = {k: v_ for k, v_ in sd.items() if not k.startswith("lstm.")}
    key_map = dict(SA_KEY_MAP)
    key_map = {
        r"^self_attns\.(\d+)\.multi_head_attn\.linears\.0":
            r"self_attn_\1.mhatt.q_lin",
        r"^self_attns\.(\d+)\.multi_head_attn\.linears\.1":
            r"self_attn_\1.mhatt.k_lin",
        r"^self_attns\.(\d+)\.multi_head_attn\.linears\.2":
            r"self_attn_\1.mhatt.v_lin",
        r"^self_attns\.(\d+)\.multi_head_attn\.linears\.3":
            r"self_attn_\1.mhatt.out_lin",
        r"^self_attns\.(\d+)\.fcn\.0": r"self_attn_\1.ffn.fc",
        r"^self_attns\.(\d+)\.fcn\.3": r"self_attn_\1.ffn.out",
        r"^self_attns\.(\d+)\.ln_mha": r"self_attn_\1.ln1",
        r"^self_attns\.(\d+)\.ln_fcn": r"self_attn_\1.ln2",
        r"^attn_pool\.linear\.0": "attn_pool.lin1",
        r"^attn_pool\.linear\.3": "attn_pool.lin2",
    }
    converted, stats = convert_torch_state_dict(
        lin_sd, params, key_map=key_map
    )
    assert stats["missed"] == 0 and stats["shape_mismatch"] == 0, stats
    j_out, j_vec = jmod.apply({"params": converted}, x, mask)
    np.testing.assert_allclose(np.asarray(j_out), t_out.numpy(), atol=ATOL)
    np.testing.assert_allclose(np.asarray(j_vec), t_vec.numpy(), atol=ATOL)
