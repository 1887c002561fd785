"""Optimal-transport (UNITER WRA head) golden parity: our lax-loop IPOT
vs the reference's torch implementation on identical inputs."""

import os

import numpy as np
import pytest

pytestmark = pytest.mark.skipif(
    not os.path.isdir("/root/reference/mmf"),
    reason="reference checkout not mounted",
)


@pytest.fixture(scope="module")
def ref():
    from tests.reference_parity import shims

    shims.install()
    import mmf.modules.ot as ref_ot

    yield ref_ot
    shims.uninstall()


def test_optimal_transport_dist_parity(ref):
    import torch

    from mmf_tpu.modules import ot as ours

    rng = np.random.RandomState(0)
    B, M, N, D = 3, 6, 5, 8
    x = rng.randn(B, M, D).astype(np.float32)
    y = rng.randn(B, N, D).astype(np.float32)
    x_pad = np.zeros((B, M), bool)
    y_pad = np.zeros((B, N), bool)
    # pad the tails of sample 1
    x_pad[1, -2:] = True
    y_pad[1, -1] = True

    tx, ty = torch.from_numpy(x), torch.from_numpy(y)
    with torch.no_grad():
        t_dist = ref.optimal_transport_dist(
            tx, ty, torch.from_numpy(x_pad), torch.from_numpy(y_pad)
        )
    j_dist = ours.optimal_transport_dist(x, y, x_pad, y_pad)
    np.testing.assert_allclose(
        np.asarray(j_dist), t_dist.numpy(), atol=2e-5
    )
