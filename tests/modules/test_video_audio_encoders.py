"""The formerly-gated encoders: R(2+1)D-18 video, spectrogram ResNet-18,
caffe-C4 grid features, FRCNN region features."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mmf_tpu.common.registry import registry
from mmf_tpu.utils.env import setup_imports

setup_imports()


def test_r2plus1d_18_shapes_and_size():
    enc = registry.get_encoder_class("r2plus1d_18")(num_output_features=2)
    x = jnp.asarray(np.random.RandomState(0).randn(2, 8, 3, 32, 32),
                    jnp.float32)  # BTCHW
    v = enc.init({"params": jax.random.PRNGKey(0)}, x)
    out, _ = enc.apply(v, x, train=True, mutable=["batch_stats"])
    assert out.shape == (2, 2, 512)
    n = sum(np.prod(p.shape)
            for p in jax.tree_util.tree_leaves(v["params"]))
    # the torchvision reference model is ~31.5M params; the factorized
    # mid-channel sizing should land in the same ballpark
    assert 25e6 < n < 40e6

    # BCTHW input accepted too
    out2, _ = enc.apply(v, x.transpose(0, 2, 1, 3, 4), train=True,
                        mutable=["batch_stats"])
    assert out2.shape == (2, 2, 512)


def test_resnet18_audio():
    enc = registry.get_encoder_class("resnet18_audio")(num_output_features=1)
    spec = jnp.asarray(np.random.RandomState(0).randn(2, 1, 64, 96),
                       jnp.float32)
    v = enc.init({"params": jax.random.PRNGKey(0)}, spec)
    out, _ = enc.apply(v, spec, train=True, mutable=["batch_stats"])
    assert out.shape == (2, 1, 512)
    # [B, H, W] (no channel dim) also accepted
    out2, _ = enc.apply(v, spec[:, 0], train=True, mutable=["batch_stats"])
    assert out2.shape == (2, 1, 512)


def test_detectron2_resnet_grid_tokens():
    enc = registry.get_encoder_class("detectron2_resnet")()
    img = jnp.ones((1, 3, 64, 64), jnp.float32)
    v = enc.init(jax.random.PRNGKey(0), img)
    out = enc.apply(v, img)
    assert out.shape[0] == 1 and out.shape[2] == 1024


def test_frcnn_encoder_region_tokens():
    enc = registry.get_encoder_class("frcnn")(post_nms_topk=5)
    img = jnp.asarray(np.random.RandomState(0).randn(1, 3, 64, 64),
                      jnp.float32)
    v = enc.init(jax.random.PRNGKey(0), img)
    out = enc.apply(v, img)
    assert out.shape == (1, 5, 2048)


def test_pytorchvideo_registered():
    # implemented in modules/video.py (flax SlowFast/MViT trunks);
    # behavior covered by tests/modules/test_pytorchvideo_encoder.py
    enc_cls = registry.get_encoder_class("pytorchvideo")
    assert enc_cls is not None
    assert enc_cls().out_dim == 2304
