import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mmf_tpu.common.registry import registry
from mmf_tpu.utils.env import setup_imports

setup_imports()

RNG = jax.random.PRNGKey(0)


def _init_apply(module, *args, **kwargs):
    variables = module.init(RNG, *args, **kwargs)
    return module.apply(variables, *args, **kwargs), variables


def test_fusions_all_run():
    from mmf_tpu.modules import fusions

    x = [jnp.ones((4, 16)), jnp.ones((4, 24))]
    for name, kwargs in [
        ("block", {"mm_dim": 40, "chunks": 4, "rank": 3}),
        ("block_tucker", {"mm_dim": 40, "chunks": 4}),
        ("mutan", {"mm_dim": 32, "rank": 3}),
        ("tucker", {"mm_dim": 16}),
        ("mlb", {"mm_dim": 32}),
        ("mfb", {"mm_dim": 16, "factor": 2}),
        ("mfh", {"mm_dim": 16, "factor": 2}),
        ("mcb", {"mm_dim": 64}),
        ("linear_sum", {"mm_dim": 32}),
        ("concat_mlp", {"dimensions": [32, 16]}),
    ]:
        cls = registry.get_fusion_class(name)
        assert cls is not None, name
        mod = cls(input_dims=[16, 24], output_dim=8, **kwargs)
        out, _ = _init_apply(mod, x)
        assert out.shape == (4, 8), f"{name}: {out.shape}"
        assert np.isfinite(np.asarray(out)).all(), name


def test_compact_bilinear_commutes_with_sketch():
    from mmf_tpu.modules.fusions import CompactBilinearPooling

    m = CompactBilinearPooling(8, 8, 32)
    x = jnp.asarray(np.random.RandomState(0).randn(2, 8).astype(np.float32))
    y = jnp.asarray(np.random.RandomState(1).randn(2, 8).astype(np.float32))
    v = m.init(RNG, x, y)
    out = m.apply(v, x, y)
    assert out.shape == (2, 32)


def test_classifier_layer_types():
    from mmf_tpu.modules.layers import ClassifierLayer

    x = jnp.ones((4, 16))
    for t, params in [
        ("linear", {}),
        ("weight_norm", {"hidden_dim": 8, "dropout": 0.1}),
        ("logit", {"text_hidden_dim": 8, "img_hidden_dim": 8}),
        ("mlp", {"num_layers": 1, "hidden_dim": 8}),
        ("bert", {"hidden_size": 16}),
    ]:
        mod = ClassifierLayer(t, 16, 5, params=params)
        out, _ = _init_apply(mod, x)
        assert out.shape == (4, 5), t


def test_top_down_attention_masks_locations():
    from mmf_tpu.modules.attention import AttentionLayer

    img = jnp.asarray(np.random.RandomState(0).randn(2, 10, 16).astype(np.float32))
    q = jnp.asarray(np.random.RandomState(1).randn(2, 8).astype(np.float32))
    locs = jnp.asarray([10, 4])
    mod = AttentionLayer(
        16, 8,
        modal_combine={"type": "non_linear_element_multiply",
                       "params": {"hidden_dim": 12, "dropout": 0.0}},
        transform={"type": "linear", "params": {"out_dim": 1}},
        normalization="softmax",
    )
    out, _ = _init_apply(mod, img, q, locs)
    out = np.asarray(out)
    assert out.shape == (2, 10, 1)
    # masked locations get zero attention; each row sums to 1
    assert np.allclose(out[1, 4:], 0.0)
    assert np.allclose(out.sum(axis=1), 1.0, atol=1e-5)


def test_bilstm_text_embedding():
    from mmf_tpu.modules.embeddings import BiLSTMTextEmbedding

    x = jnp.ones((2, 7, 12))
    mod = BiLSTMTextEmbedding(hidden_dim=16, embedding_dim=12,
                              bidirectional=True, rnn_type="LSTM")
    out, _ = _init_apply(mod, x)
    assert out.shape == (2, 16)


def test_attention_text_embedding():
    from mmf_tpu.modules.embeddings import AttentionTextEmbedding

    x = jnp.ones((2, 7, 12))
    mod = AttentionTextEmbedding(hidden_dim=16, embedding_dim=12, conv1_out=8,
                                 conv2_out=2)
    out, _ = _init_apply(mod, x)
    assert out.shape == (2, 32)


def test_image_feature_embedding():
    from mmf_tpu.modules.embeddings import ImageFeatureEmbedding

    img = jnp.ones((2, 10, 16))
    q = jnp.ones((2, 8))
    locs = jnp.asarray([10, 10])
    mod = ImageFeatureEmbedding(
        16, 8,
        modal_combine={"type": "non_linear_element_multiply",
                       "params": {"hidden_dim": 12, "dropout": 0.0}},
        transform={"type": "linear", "params": {"out_dim": 2}},
    )
    (emb, attn), _ = _init_apply(mod, img, q, locs)
    assert emb.shape == (2, 32)  # 2 glimpses x 16


def test_resnet152_encoder_grid():
    cls = registry.get_encoder_class("resnet152")
    # tiny image for speed
    mod = cls(num_output_features=9)
    x = jnp.ones((1, 3, 64, 64))
    variables = mod.init(RNG, x)
    out = mod.apply(variables, x)
    assert out.shape == (1, 9, 2048)


def test_poolers():
    layers = [jnp.ones((2, 5, 8)) * i for i in range(4)]
    for name, expected in [
        ("average_concat_last_k", (2, 32)),
        ("average_k_from_last", (2, 8)),
        ("average_sum_last_k", (2, 8)),
        ("cls", (2, 8)),
        ("avg", (2, 8)),
    ]:
        cls = registry.get_pool_class(name)
        pooler = cls()
        out = pooler(layers)
        assert np.asarray(out).shape == expected, name


def test_optimal_transport_distance():
    from mmf_tpu.modules.ot import optimal_transport_dist

    rng = np.random.RandomState(0)
    txt = jnp.asarray(rng.randn(2, 6, 8).astype(np.float32))
    img = jnp.asarray(rng.randn(2, 5, 8).astype(np.float32))
    txt_pad = jnp.zeros((2, 6), bool)
    img_pad = jnp.zeros((2, 5), bool)
    d = optimal_transport_dist(txt, img, txt_pad, img_pad, iteration=10)
    assert d.shape == (2,)
    assert np.isfinite(np.asarray(d)).all()
    # identical sets should have smaller distance than random ones
    d_same = optimal_transport_dist(txt, txt, txt_pad, txt_pad, iteration=10)
    assert float(d_same.mean()) < float(d.mean())


def test_movie_bottleneck():
    from mmf_tpu.modules.bottleneck import MovieBottleneck

    x = jnp.ones((2, 16, 8, 8))
    cond = jnp.ones((2, 12))
    mod = MovieBottleneck(16, 8, cond_planes=12, downsample=True)
    (out, _), _ = _init_apply(mod, x, cond)
    assert out.shape == (2, 32, 8, 8)


def test_vit_model():
    from mmf_tpu.modules.vit import ViTModel

    mod = ViTModel(hidden_size=32, num_hidden_layers=2, num_attention_heads=4,
                   intermediate_size=64, patch_size=8, image_size=32)
    x = jnp.ones((2, 3, 32, 32))
    (seq, pooled), _ = _init_apply(mod, x)
    assert seq.shape == (2, 17, 32)
    assert pooled.shape == (2, 32)
