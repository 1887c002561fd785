"""Fusion-technique golden parity vs the torch reference
(mmf/modules/fusions.py): block, block_tucker, mutan, tucker, mlb, mfb,
mfh, linear_sum, concat_mlp with converted weights on identical inputs."""

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

ATOL = 1e-5
DIMS = ([14, 10], 8)  # input_dims, output_dim


@pytest.fixture(scope="module")
def ref():
    from tests.reference_parity import shims

    shims.install()
    import mmf.modules.fusions as ref_fusions

    yield ref_fusions
    shims.uninstall()


def _inputs(seed=0):
    rng = np.random.RandomState(seed)
    return [rng.randn(3, DIMS[0][0]).astype(np.float32),
            rng.randn(3, DIMS[0][1]).astype(np.float32)]


def _run_both(ref_mod, our_key, kwargs, key_map=None, seed=0):
    import jax
    import torch

    from mmf_tpu.common.registry import registry

    torch.manual_seed(seed)
    tmod = ref_mod(DIMS[0], DIMS[1], **kwargs).eval()
    jmod = registry.get_fusion_class(our_key)(
        input_dims=DIMS[0], output_dim=DIMS[1], **kwargs
    )
    x = _inputs(seed)
    with torch.no_grad():
        t_out = tmod([torch.from_numpy(v) for v in x])
    params = jmod.init(jax.random.PRNGKey(0), x)
    sd = {k: v.detach().numpy() for k, v in tmod.state_dict().items()}
    converted, stats = convert_torch_state_dict(
        sd, params["params"], key_map=key_map or {}
    )
    assert stats["shape_mismatch"] == 0, (our_key, stats)
    assert stats["matched"] == len(sd), (our_key, stats)
    j_out = jmod.apply({"params": converted}, x)
    np.testing.assert_allclose(np.asarray(j_out), t_out.numpy(), atol=ATOL,
                               err_msg=our_key)


MERGE_MAP = {
    r"merge_linears0\.(\d+)": r"merge0_\1",
    r"merge_linears1\.(\d+)": r"merge1_\1",
}


def test_block(ref):
    _run_both(ref.Block, "block", {"mm_dim": 12, "chunks": 3, "rank": 2},
              key_map=MERGE_MAP)


def test_block_pos_norm_after_cat(ref):
    _run_both(ref.Block, "block",
              {"mm_dim": 12, "chunks": 3, "rank": 2,
               "pos_norm": "after_cat"}, key_map=MERGE_MAP)


def test_block_tucker(ref):
    _run_both(ref.BlockTucker, "block_tucker",
              {"mm_dim": 12, "chunks": 3}, key_map={
                  r"bilinears\.(\d+)": r"bilinear_\1"})


def test_mutan(ref):
    _run_both(ref.Mutan, "mutan", {"mm_dim": 12, "rank": 2},
              key_map={r"merge_linear0": "merge_linear0",
                       r"merge_linear1": "merge_linear1"})


def test_tucker(ref):
    _run_both(ref.Tucker, "tucker", {"mm_dim": 12})


def test_mlb(ref):
    _run_both(ref.MLB, "mlb", {"mm_dim": 12})


def test_mfb(ref):
    _run_both(ref.MFB, "mfb", {"mm_dim": 12, "factor": 2})


def test_mfh(ref):
    _run_both(ref.MFH, "mfh", {"mm_dim": 12, "factor": 2})


def test_linear_sum(ref):
    _run_both(ref.LinearSum, "linear_sum", {"mm_dim": 12})


def test_concat_mlp(ref):
    _run_both(ref.ConcatMLP, "concat_mlp",
              {"dimensions": [16, 8]},
              key_map={r"mlp\.linears\.(\d+)": r"mlp.linear_\1"})
