"""BAN bilinear-attention golden parity vs the torch reference
(mmf/modules/layers.py BCNet/BiAttention), including weight_norm
conversion (torch weight_g/weight_v -> flax WeightNorm kernel+scale)."""

import os

import numpy as np
import pytest

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
    import mmf.modules.layers as ref_layers

    yield ref_layers
    shims.uninstall()


def _fcnet_params(sd, prefix):
    """torch FCNet (Sequential of weight_norm Linear + act) -> our FCNet
    subtree. torch weight_norm(dim=None): w = g * v/||v||; flax WeightNorm:
    w = scale * kernel/||kernel|| -> kernel=v.T, scale=g."""
    # single-layer FCNet: main.0 is the weight-normed Linear
    g = sd[f"{prefix}.main.0.parametrizations.weight.original0"] \
        if f"{prefix}.main.0.parametrizations.weight.original0" in sd \
        else sd[f"{prefix}.main.0.weight_g"]
    v = sd[f"{prefix}.main.0.parametrizations.weight.original1"] \
        if f"{prefix}.main.0.parametrizations.weight.original1" in sd \
        else sd[f"{prefix}.main.0.weight_v"]
    bias = sd[f"{prefix}.main.0.bias"]
    return {
        "Dense_0": {"kernel": np.ascontiguousarray(v.T), "bias": bias},
        "fc_0": {"Dense_0/kernel/scale": np.float32(g.reshape(()))},
    }


def test_bcnet_low_glimpse_parity(ref):
    """h_out <= c path: h_mat/h_bias Hadamard + matmul."""
    import jax
    import torch

    from mmf_tpu.modules.layers import BCNet

    torch.manual_seed(9)
    VD, QD, H, G, K = 6, 5, 4, 2, 3
    tnet = ref.BCNet(VD, QD, H, G, dropout=[0.0, 0.0], k=K).eval()
    jnet = BCNet(h_dim=H, h_out=G, dropout=[0.0, 0.0], k=K)

    B, NV, NQ = 2, 4, 3
    rng = np.random.RandomState(9)
    v = rng.randn(B, NV, VD).astype(np.float32)
    q = rng.randn(B, NQ, QD).astype(np.float32)

    with torch.no_grad():
        t_logits = tnet(torch.from_numpy(v), torch.from_numpy(q))

    params = jax.tree_util.tree_map(
        np.asarray, jnet.init(jax.random.PRNGKey(0), v, q)
    )["params"]
    sd = {k: val.detach().numpy() for k, val in tnet.state_dict().items()}
    params["v_net"] = _fcnet_params(sd, "v_net")
    params["q_net"] = _fcnet_params(sd, "q_net")
    params["h_mat"] = sd["h_mat"]
    params["h_bias"] = sd["h_bias"]

    j_logits = jnet.apply({"params": params}, v, q)
    assert j_logits.shape == t_logits.numpy().shape
    np.testing.assert_allclose(np.asarray(j_logits), t_logits.numpy(),
                               atol=ATOL)


def test_biattention_parity(ref):
    import jax
    import torch

    from mmf_tpu.modules.layers import BiAttention

    torch.manual_seed(10)
    VD, QD, Z, G = 6, 6, 4, 2
    tnet = ref.BiAttention(VD, QD, Z, G, dropout=[0.0, 0.0]).eval()
    jnet = BiAttention(z_dim=Z, glimpse=G, dropout=[0.0, 0.0])

    B, NV, NQ = 2, 4, 3
    rng = np.random.RandomState(10)
    v = rng.randn(B, NV, VD).astype(np.float32)
    # zero out one region: the v_mask path must exclude it
    v[1, -1] = 0
    q = rng.randn(B, NQ, QD).astype(np.float32)

    with torch.no_grad():
        t_p, t_logits = tnet(torch.from_numpy(v), torch.from_numpy(q))

    params = jax.tree_util.tree_map(
        np.asarray, jnet.init(jax.random.PRNGKey(0), v, q)
    )["params"]
    sd = {k: val.detach().numpy() for k, val in tnet.state_dict().items()}
    params["logits"]["v_net"] = _fcnet_params(sd, "logits.v_net")
    params["logits"]["q_net"] = _fcnet_params(sd, "logits.q_net")
    # BiAttention weight-norms h_mat (dim=None): effective = g * v/||v||_F
    h_g, h_v = sd["logits.h_mat_g"], sd["logits.h_mat_v"]
    params["logits"]["h_mat"] = h_g * h_v / np.linalg.norm(h_v)
    params["logits"]["h_bias"] = sd["logits.h_bias"]

    j_p, j_logits = jnet.apply({"params": params}, v, q)
    np.testing.assert_allclose(np.asarray(j_p), t_p.numpy(), atol=ATOL)
