"""Config-reachable pipeline and sequence parallelism: the trunk's
``pipeline_stages`` / ``pipeline_microbatches`` / ``sequence_parallel``
TransformerConfig knobs (modules/transformer.py) route the SAME unrolled
params through parallel/pipeline.py / ops/ring_attention.py — so a user
YAML alone turns them on (``model_config.<model>.pipeline_stages`` or
``training.pipeline.num_stages``; VERDICT round-3 item #4).

Beyond reference parity: MMF has no PP/SP (SURVEY.md §2.10)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from mmf_tpu.modules.transformer import (
    TextEmbeddings,
    TransformerConfig,
    TransformerEncoder,
)
from mmf_tpu.ops.attention import make_attention_bias
from mmf_tpu.parallel import mesh as mesh_lib


@pytest.fixture(autouse=True)
def _restore_mesh():
    saved = mesh_lib._GLOBAL_MESH
    yield
    mesh_lib.set_mesh(saved)


def _mesh(model=4):
    devs = jax.devices()
    data = len(devs) // model
    m = Mesh(np.asarray(devs).reshape(data, model), ("data", "model"))
    mesh_lib.set_mesh(m)
    return m


CFG = dict(
    hidden_size=32, num_attention_heads=4, intermediate_size=64,
    num_hidden_layers=8, vocab_size=100, max_position_embeddings=64,
    hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
)


def _trunk_io(seq=16, batch=8):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(batch, seq, 32).astype(np.float32))
    mask = np.ones((batch, seq), np.float32)
    mask[1, -3:] = 0
    bias = make_attention_bias(jnp.asarray(mask))
    return x, bias, jnp.asarray(mask)


def test_pipeline_config_matches_unrolled():
    """pipeline_stages=4 through the config knob produces the unrolled
    trunk's output bit-for-bit-tolerance — same unrolled layer_i params,
    stacking happens inside the step."""
    _mesh(4)
    x, bias, _ = _trunk_io()
    ref_enc = TransformerEncoder(TransformerConfig(**CFG))
    params = ref_enc.init(jax.random.PRNGKey(0), x, bias)["params"]
    ref = ref_enc.apply({"params": params}, x, bias)

    pp_enc = TransformerEncoder(
        TransformerConfig(**CFG, pipeline_stages=4, pipeline_microbatches=8)
    )
    out = jax.jit(
        lambda p, x, b: pp_enc.apply({"params": p}, x, b)
    )(params, x, bias)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-6)


def test_pipeline_config_gradients_match():
    """jax.grad through the pipelined trunk equals the unrolled trunk's
    gradients (ppermute/scan/where all have exact transpose rules)."""
    _mesh(4)
    x, bias, _ = _trunk_io()
    ref_enc = TransformerEncoder(TransformerConfig(**CFG))
    pp_enc = TransformerEncoder(
        TransformerConfig(**CFG, pipeline_stages=4)
    )
    params = ref_enc.init(jax.random.PRNGKey(0), x, bias)["params"]

    def loss(enc):
        return lambda p: jnp.sum(
            jnp.tanh(enc.apply({"params": p}, x, bias))
        )

    g_ref = jax.grad(loss(ref_enc))(params)
    g_pp = jax.jit(jax.grad(loss(pp_enc)))(params)
    flat_ref = jax.tree_util.tree_flatten_with_path(g_ref)[0]
    flat_pp = dict(jax.tree_util.tree_flatten_with_path(g_pp)[0])
    scale = max(float(np.max(np.abs(np.asarray(v)))) for _, v in flat_ref)
    for path, ref_leaf in flat_ref:
        name = "/".join(str(getattr(p, "key", p)) for p in path)
        err = float(np.max(np.abs(
            np.asarray(flat_pp[path]) - np.asarray(ref_leaf)
        )))
        assert err < 5e-5 * max(scale, 1.0), f"grad mismatch {name}: {err}"


def test_pipeline_train_mode_dropout_runs():
    """Training mode with dropout: per-(microbatch, stage, layer) keys —
    runs, is deterministic for a fixed rng, and differs across rngs."""
    _mesh(4)
    x, bias, _ = _trunk_io()
    cfg = dataclasses.replace(
        TransformerConfig(**CFG, pipeline_stages=4),
        hidden_dropout_prob=0.3,
    )
    enc = TransformerEncoder(cfg)
    params = enc.init(jax.random.PRNGKey(0), x, bias)["params"]

    def run(seed):
        return enc.apply(
            {"params": params}, x, bias, False,
            rngs={"dropout": jax.random.PRNGKey(seed)},
        )

    a, a2, b = run(1), run(1), run(2)
    np.testing.assert_allclose(np.asarray(a), np.asarray(a2))
    assert float(np.max(np.abs(np.asarray(a) - np.asarray(b)))) > 1e-3


def test_pipeline_fallback_when_mesh_mismatch():
    """pipeline_stages that don't match the mesh's model axis fall back
    to the unrolled trunk (logged, never wrong)."""
    _mesh(2)  # model axis 2, but pipeline_stages=4
    x, bias, _ = _trunk_io()
    ref_enc = TransformerEncoder(TransformerConfig(**CFG))
    pp_enc = TransformerEncoder(TransformerConfig(**CFG, pipeline_stages=4))
    params = ref_enc.init(jax.random.PRNGKey(0), x, bias)["params"]
    ref = ref_enc.apply({"params": params}, x, bias)
    out = pp_enc.apply({"params": params}, x, bias)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref))


def test_sequence_parallel_config_matches_dense():
    """sequence_parallel=true routes self-attention through ring
    attention over the model axis; output matches dense attention to
    f32 online-softmax tolerance, padding mask honored."""
    _mesh(4)
    x, bias, _ = _trunk_io(seq=16)
    ref_enc = TransformerEncoder(TransformerConfig(**CFG))
    sp_enc = TransformerEncoder(
        TransformerConfig(**CFG, sequence_parallel=True)
    )
    params = ref_enc.init(jax.random.PRNGKey(0), x, bias)["params"]
    ref = ref_enc.apply({"params": params}, x, bias)
    out = jax.jit(
        lambda p, x, b: sp_enc.apply({"params": p}, x, b)
    )(params, x, bias)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_sequence_parallel_gradients_match():
    _mesh(4)
    x, bias, _ = _trunk_io(seq=16)
    ref_enc = TransformerEncoder(TransformerConfig(**CFG))
    sp_enc = TransformerEncoder(
        TransformerConfig(**CFG, sequence_parallel=True)
    )
    params = ref_enc.init(jax.random.PRNGKey(0), x, bias)["params"]

    def loss(enc):
        return lambda p: jnp.sum(jnp.tanh(enc.apply({"params": p}, x, bias)))

    g_ref = jax.grad(loss(ref_enc))(params)
    g_sp = jax.jit(jax.grad(loss(sp_enc)))(params)
    flat_ref = jax.tree_util.tree_flatten_with_path(g_ref)[0]
    flat_sp = dict(jax.tree_util.tree_flatten_with_path(g_sp)[0])
    scale = max(float(np.max(np.abs(np.asarray(v)))) for _, v in flat_ref)
    for path, ref_leaf in flat_ref:
        name = "/".join(str(getattr(p, "key", p)) for p in path)
        err = float(np.max(np.abs(
            np.asarray(flat_sp[path]) - np.asarray(ref_leaf)
        )))
        assert err < 1e-4 * max(scale, 1.0), f"grad mismatch {name}: {err}"


def test_sequence_parallel_indivisible_falls_back():
    """Sequence lengths that don't divide the model axis run dense."""
    _mesh(4)
    x, bias, _ = _trunk_io(seq=15)  # 15 % 4 != 0
    sp_enc = TransformerEncoder(
        TransformerConfig(**CFG, sequence_parallel=True)
    )
    ref_enc = TransformerEncoder(TransformerConfig(**CFG))
    params = ref_enc.init(jax.random.PRNGKey(0), x, bias)["params"]
    np.testing.assert_allclose(
        np.asarray(sp_enc.apply({"params": params}, x, bias)),
        np.asarray(ref_enc.apply({"params": params}, x, bias)),
    )


def test_training_config_injection():
    """training.pipeline.num_stages / training.sequence_parallel inject
    into the active model_config at load_model (a user YAML alone turns
    the features on — no code required)."""
    from tests.trainer_fixtures import make_trainer

    trainer = make_trainer(
        save_dir="/tmp/mmf_tpu_pp_inject",
        **{
            "training.pipeline.num_stages": 2,
            "training.pipeline.num_microbatches": 4,
            "training.sequence_parallel": True,
        },
    )
    mc = trainer.config["model_config"]["simple_model"]
    assert mc["pipeline_stages"] == 2
    assert mc["pipeline_microbatches"] == 4
    assert mc["sequence_parallel"] is True
    assert trainer._uses_pp_or_sp()


def test_full_visual_bert_trunk_pipeline_step():
    """The flagship model end-to-end: VisualBertBase with
    pipeline_stages=4 (config knob only) — forward parity vs the plain
    config and a full value_and_grad step on the 2x4 mesh."""
    from mmf_tpu.models.visual_bert import VisualBertBase

    _mesh(4)
    cfg = TransformerConfig(**CFG)
    rng = np.random.RandomState(3)
    B, S, R = 8, 12, 4
    ids = jnp.asarray(rng.randint(0, 100, (B, S)))
    ttype = jnp.zeros((B, S), jnp.int32)
    vis = jnp.asarray(rng.randn(B, R, 8).astype(np.float32))
    vtype = jnp.ones((B, R), jnp.int32)
    mask = jnp.ones((B, S + R), jnp.float32)

    ref_m = VisualBertBase(cfg, visual_embedding_dim=8)
    pp_m = VisualBertBase(
        dataclasses.replace(cfg, pipeline_stages=4), visual_embedding_dim=8
    )
    params = ref_m.init(jax.random.PRNGKey(0), ids, mask, ttype, vis,
                        vtype)["params"]
    seq_ref, pooled_ref = ref_m.apply({"params": params}, ids, mask,
                                      ttype, vis, vtype)
    seq_pp, pooled_pp = jax.jit(
        lambda p: pp_m.apply({"params": p}, ids, mask, ttype, vis, vtype)
    )(params)
    np.testing.assert_allclose(np.asarray(pooled_pp),
                               np.asarray(pooled_ref),
                               rtol=2e-5, atol=2e-6)

    def loss(p):
        _, pooled = pp_m.apply({"params": p}, ids, mask, ttype, vis, vtype)
        return jnp.sum(pooled ** 2)

    val, grads = jax.jit(jax.value_and_grad(loss))(params)
    assert np.isfinite(float(val))
    gnorm = float(
        jnp.sqrt(sum(jnp.sum(g.astype(jnp.float32) ** 2)
                     for g in jax.tree_util.tree_leaves(grads)))
    )
    assert gnorm > 0 and np.isfinite(gnorm)
