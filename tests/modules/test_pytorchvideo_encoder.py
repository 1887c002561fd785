"""pytorchvideo encoder surface (VERDICT r1 item 7): flax SlowFast/MViT
trunks behind the reference's config surface
(reference encoders.py:704-786, tests/modules/test_encoders.py:110-165)."""

import jax
import numpy as np
import pytest

from mmf_tpu.common.registry import registry
from mmf_tpu.utils.env import setup_imports

setup_imports()


def _build(**config):
    cls = registry.get_encoder_class("pytorchvideo")
    assert cls is not None
    return cls(**config)


# tiny spatial size keeps CPU runtime sane; channel dims are what the
# reference test contract checks
def test_slowfast_r50_output_dim():
    enc = _build()  # defaults: slowfast_r50, identity pooler
    rng = np.random.RandomState(0)
    slow = rng.randn(1, 3, 8, 32, 32).astype(np.float32)
    fast = rng.randn(1, 3, 32, 32, 32).astype(np.float32)
    variables = enc.init(jax.random.PRNGKey(0), [slow, fast])
    out = enc.apply(variables, [slow, fast])
    # (bs, feature_dim) == (1, 2304) — reference test_encoders.py:121
    assert out.shape == (1, 2304)
    assert enc.out_dim == 2304
    assert np.isfinite(np.asarray(out)).all()


def test_slow_r50_output_dim():
    enc = _build(model_name="slow_r50")
    x = np.random.RandomState(1).randn(2, 3, 4, 32, 32).astype(np.float32)
    variables = enc.init(jax.random.PRNGKey(0), x)
    out = enc.apply(variables, x)
    assert out.shape == (2, 2048)


MVIT_CONFIG = dict(
    model_name="mvit_base_32x3",
    random_init=True,
    drop_last_n_layers=0,
    spatial_size=64,
    temporal_size=8,
    head=None,
    embed_dim_mul=[[1, 2.0], [3, 2.0], [14, 2.0]],
    atten_head_mul=[[1, 2.0], [3, 2.0], [14, 2.0]],
    pool_q_stride_size=[[1, 1, 2, 2], [3, 1, 2, 2], [14, 1, 2, 2]],
    pool_kv_stride_adaptive=[1, 8, 8],
    pool_kvq_kernel=[3, 3, 3],
)


@pytest.fixture(scope="module")
def mvit_out():
    enc = _build(**dict(MVIT_CONFIG, pooler_name="identity"))
    x = np.random.RandomState(2).randn(1, 3, 8, 64, 64).astype(np.float32)
    variables = enc.init(jax.random.PRNGKey(0), x)
    return enc.apply(variables, x)


def test_mvit_identity_pooler_tokens(mvit_out):
    # 64px/8f input: patch grid 4x16x16, pooled 2x at layers 1/3/14 ->
    # 4*2*2 tokens + cls, final dim 96*8=768 (reference contract:
    # (bs, num_features, 768))
    assert mvit_out.shape == (1, 4 * 2 * 2 + 1, 768)
    assert np.isfinite(np.asarray(mvit_out)).all()


def test_mvit_cls_and_avg_poolers():
    for pooler in ("cls", "avg"):
        enc = _build(**dict(MVIT_CONFIG, pooler_name=pooler))
        x = np.random.RandomState(3).randn(1, 3, 8, 64, 64).astype(
            np.float32
        )
        variables = enc.init(jax.random.PRNGKey(0), x)
        out = enc.apply(variables, x)
        assert out.shape == (1, 768)


def test_unknown_model_name_raises():
    enc = _build(model_name="x3d_nope")
    x = np.zeros((1, 3, 4, 16, 16), np.float32)
    with pytest.raises(ValueError, match="x3d_nope"):
        enc.init(jax.random.PRNGKey(0), x)
