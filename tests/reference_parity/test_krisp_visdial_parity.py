"""Golden parity for the last two model families without converted-weight
tests: KRISP's bilinear GraphPtrNet (reference mmf/models/krisp.py:246-283)
and VisDial's discriminator decoder (reference mmf/modules/decoders.py:8-51).

The full reference KRISP graph network needs gensim + on-disk KB graphs
(projects/krisp/graphnetwork_module.py), so the graph-side parity pins the
one component defined in the reference model file itself; VisDial's
discriminator is self-contained and fully pinned."""

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
    import mmf.models.krisp as ref_krisp
    import mmf.modules.decoders as ref_decoders

    yield {"krisp": ref_krisp, "decoders": ref_decoders}
    shims.uninstall()


def test_krisp_graph_ptr_net_parity(ref):
    import jax
    import torch

    from mmf_tpu.models.krisp import GraphPtrNet

    torch.manual_seed(21)
    HID, GHID = 16, 12
    tmod = ref["krisp"].GraphPtrNet(HID, GHID).eval()
    jmod = GraphPtrNet(hidden_size=HID)

    B, N = 3, 7
    rng = np.random.RandomState(21)
    bl_hidden = rng.randn(B, HID).astype(np.float32)
    graph_hidden = rng.randn(B, N, GHID).astype(np.float32)

    with torch.no_grad():
        t_scores = tmod(
            torch.from_numpy(bl_hidden), torch.from_numpy(graph_hidden)
        )

    params = jmod.init(jax.random.PRNGKey(0), bl_hidden, graph_hidden)
    sd = {k: v.detach().numpy() for k, v in tmod.state_dict().items()}
    converted, stats = convert_torch_state_dict(sd, params["params"])
    assert stats["missed"] == 0 and stats["shape_mismatch"] == 0, stats

    j_scores = jmod.apply({"params": converted}, bl_hidden, graph_hidden)
    assert j_scores.shape == (B, N)
    np.testing.assert_allclose(
        np.asarray(j_scores), t_scores.numpy(), atol=ATOL
    )


def test_visdial_discriminator_parity(ref):
    import jax
    import torch
    from torch import nn as tnn

    from mmf_tpu.modules.decoders import VisDialDiscriminator

    torch.manual_seed(22)
    EMB_DIM, HID = 10, 8
    B, D, NOPT, SEQ = 2, 3, 5, 4
    VOCAB = 30

    # the reference takes any embedding module exposing text_out_dim;
    # mean-pooled token embeddings keep the parity exact and simple
    class TorchMeanEmbedding(tnn.Module):
        def __init__(self):
            super().__init__()
            self.table = tnn.Embedding(VOCAB, EMB_DIM)
            self.text_out_dim = EMB_DIM

        def forward(self, ids):
            return self.table(ids).mean(dim=1)

    temb = TorchMeanEmbedding()
    tcfg = type("Cfg", (), {"hidden_dim": HID})()
    tmod = ref["decoders"].VisDialDiscriminator(tcfg, temb).eval()

    rng = np.random.RandomState(22)
    encoder_output = rng.randn(B * D, HID).astype(np.float32)
    answer_options = rng.randint(0, VOCAB, (B, D, NOPT, SEQ))
    answer_options_len = np.full((B, D, NOPT), SEQ, np.int64)

    with torch.no_grad():
        t_scores = tmod(
            torch.from_numpy(encoder_output),
            {
                "answer_options": torch.from_numpy(answer_options),
                "answer_options_len": torch.from_numpy(answer_options_len),
            },
        )

    # our discriminator takes externally-embedded options (the model ties
    # the shared text-embedding stack at the call site); embed with the
    # SAME torch table so parity isolates the projection+scoring math
    table = temb.table.weight.detach().numpy()
    flat_ids = answer_options.reshape(-1, SEQ)
    option_emb = table[flat_ids].mean(axis=1)          # (B*D*NOPT, EMB)
    option_emb = option_emb.reshape(B * D, NOPT, EMB_DIM).astype(np.float32)

    jmod = VisDialDiscriminator(hidden_dim=HID)
    params = jmod.init(jax.random.PRNGKey(0), encoder_output, option_emb)
    sd = {k: v.detach().numpy() for k, v in tmod.state_dict().items()
          if k.startswith("projection_layer")}
    converted, stats = convert_torch_state_dict(sd, params["params"])
    assert stats["missed"] == 0 and stats["shape_mismatch"] == 0, stats

    j_scores = jmod.apply({"params": converted}, encoder_output, option_emb)
    assert np.asarray(j_scores).shape == tuple(t_scores.shape)
    np.testing.assert_allclose(
        np.asarray(j_scores), t_scores.numpy(), atol=ATOL
    )
