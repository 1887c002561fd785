"""LR schedule golden parity: our optax schedule multipliers vs the
reference's torch LambdaLR-based schedulers, step by step."""

import os

import numpy as np
import pytest

from mmf_tpu.common.registry import registry
from mmf_tpu.config import omega
from mmf_tpu.utils.env import setup_imports

setup_imports()

pytestmark = pytest.mark.skipif(
    not os.path.isdir("/root/reference/mmf"),
    reason="reference checkout not mounted",
)


@pytest.fixture(scope="module")
def ref():
    from tests.reference_parity import shims

    shims.install()
    import mmf.modules.schedulers as ref_schedulers
    import mmf.utils.general as ref_general

    yield {"schedulers": ref_schedulers, "general": ref_general}
    shims.uninstall()


def _torch_lrs(scheduler, optimizer, steps):
    lrs = []
    for _ in range(steps):
        lrs.append(optimizer.param_groups[0]["lr"])
        optimizer.step()
        scheduler.step()
    return np.asarray(lrs)


def _our_lrs(key, config, params, steps, base_lr=1.0):
    schedule = registry.get_scheduler_class(key)(config, params)
    return np.asarray([base_lr * float(schedule(s)) for s in range(steps)])


def test_warmup_linear_matches_hf(ref):
    import torch

    opt = torch.optim.SGD([torch.nn.Parameter(torch.zeros(1))], lr=1.0)
    t_sched = ref["schedulers"].WarmupLinearScheduler(
        opt, num_warmup_steps=5, num_training_steps=20
    )
    t_lrs = _torch_lrs(t_sched, opt, 20)
    config = omega.create({"training": {"max_updates": 20}})
    j_lrs = _our_lrs("warmup_linear", config,
                     {"num_warmup_steps": 5, "num_training_steps": 20}, 20)
    np.testing.assert_allclose(j_lrs, t_lrs, atol=1e-6)


def test_warmup_cosine_matches_hf(ref):
    import torch

    opt = torch.optim.SGD([torch.nn.Parameter(torch.zeros(1))], lr=1.0)
    t_sched = ref["schedulers"].WarmupCosineScheduler(
        opt, num_warmup_steps=4, num_training_steps=16
    )
    t_lrs = _torch_lrs(t_sched, opt, 16)
    config = omega.create({"training": {"max_updates": 16}})
    j_lrs = _our_lrs("warmup_cosine", config,
                     {"num_warmup_steps": 4, "num_training_steps": 16}, 16)
    np.testing.assert_allclose(j_lrs, t_lrs, atol=1e-6)


def test_pythia_scheduler_matches_lr_lambda_update(ref):
    """Our pythia schedule vs the reference's lr_lambda_update at every
    step of a warmup + multi-step decay run."""
    cfg_dict = {
        "training": {
            "use_warmup": True,
            "warmup_iterations": 4,
            "warmup_factor": 0.25,
            "lr_steps": [10, 15],
            "lr_ratio": 0.1,
            "max_updates": 20,
        }
    }
    t_cfg = omega.create(cfg_dict)
    t_mults = np.asarray([
        float(ref["general"].lr_lambda_update(s, t_cfg)) for s in range(20)
    ])
    j_lrs = _our_lrs("pythia", omega.create(cfg_dict), None, 20)
    np.testing.assert_allclose(j_lrs, t_mults, atol=1e-6)
