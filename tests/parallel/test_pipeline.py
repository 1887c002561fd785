"""Pipeline parallelism: pipelined forward/backward must match the
unpipelined sequential stack exactly (same reduction order — stages run
the same per-microbatch compute, so tolerance is tight f32).

Runs on the 8-virtual-device CPU mesh from conftest.py.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from mmf_tpu.parallel.pipeline import (
    pipeline_apply,
    pipeline_transformer_stage,
    stack_stage_params,
    stage_params_sharding,
    trunk_pipeline_params,
    unstack_stage_params,
)


def make_mesh(n=4, axis="model"):
    devs = jax.devices()[:n]
    return Mesh(np.asarray(devs).reshape(n), (axis,))


def mlp_stage(params, x):
    h = jnp.tanh(x @ params["w1"] + params["b1"])
    return h @ params["w2"] + params["b2"]


def init_mlp_stages(key, n_stages, d=16, hidden=32):
    stages = []
    for i in range(n_stages):
        k1, k2, key = jax.random.split(jax.random.fold_in(key, i), 3)
        stages.append({
            "w1": jax.random.normal(k1, (d, hidden)) * 0.2,
            "b1": jnp.zeros((hidden,)),
            "w2": jax.random.normal(k2, (hidden, d)) * 0.2,
            "b2": jnp.zeros((d,)),
        })
    return stages


def sequential(stages, x):
    for p in stages:
        x = mlp_stage(p, x)
    return x


def test_pipeline_forward_matches_sequential():
    mesh = make_mesh(4)
    stages = init_mlp_stages(jax.random.PRNGKey(0), 4)
    stacked = stack_stage_params(stages)
    x = jax.random.normal(jax.random.PRNGKey(1), (24, 16))

    ref = sequential(stages, x)
    out = pipeline_apply(mlp_stage, stacked, x, mesh, axis="model",
                         num_microbatches=8)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-6, atol=1e-6)


def test_pipeline_default_microbatches_and_jit():
    mesh = make_mesh(8)
    stages = init_mlp_stages(jax.random.PRNGKey(2), 8, d=8, hidden=8)
    stacked = stack_stage_params(stages)
    x = jax.random.normal(jax.random.PRNGKey(3), (16, 8))

    fn = jax.jit(lambda p, x_: pipeline_apply(
        mlp_stage, p, x_, mesh, axis="model"))
    out = fn(stacked, x)
    ref = sequential(stages, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-6)


def test_pipeline_gradients_match_sequential():
    mesh = make_mesh(4)
    stages = init_mlp_stages(jax.random.PRNGKey(4), 4)
    stacked = stack_stage_params(stages)
    x = jax.random.normal(jax.random.PRNGKey(5), (16, 16))
    tgt = jax.random.normal(jax.random.PRNGKey(6), (16, 16))

    def pipe_loss(p):
        y = pipeline_apply(mlp_stage, p, x, mesh, axis="model",
                           num_microbatches=4)
        return jnp.mean((y - tgt) ** 2)

    def seq_loss(p):
        y = sequential(unstack_stage_params(p, 4), x)
        return jnp.mean((y - tgt) ** 2)

    g_pipe = jax.grad(pipe_loss)(stacked)
    g_seq = jax.grad(seq_loss)(stacked)
    for a, b in zip(jax.tree_util.tree_leaves(g_pipe),
                    jax.tree_util.tree_leaves(g_seq)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


def test_pipeline_with_extras():
    """Extras (e.g. a per-example bias) are microbatched alongside x."""
    mesh = make_mesh(4)

    def stage(params, x, bias):
        return jnp.tanh(x @ params["w"]) + bias

    stages = [{"w": jax.random.normal(jax.random.fold_in(
        jax.random.PRNGKey(7), i), (8, 8)) * 0.3} for i in range(4)]
    stacked = stack_stage_params(stages)
    x = jax.random.normal(jax.random.PRNGKey(8), (16, 8))
    bias = jax.random.normal(jax.random.PRNGKey(9), (16, 8)) * 0.1

    out = pipeline_apply(stage, stacked, x, mesh, axis="model",
                         num_microbatches=4, extras=(bias,))
    ref = x
    for p in stages:
        ref = jnp.tanh(ref @ p["w"]) + bias
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-6, atol=1e-6)


def test_pipeline_sharded_params_placement():
    """Stacked stage params can actually live sharded over the pipe axis
    (each device holds only its stage) and the result is unchanged."""
    mesh = make_mesh(4)
    stages = init_mlp_stages(jax.random.PRNGKey(10), 4)
    stacked = stack_stage_params(stages)
    stacked = jax.device_put(stacked, stage_params_sharding(mesh, "model"))
    x = jax.random.normal(jax.random.PRNGKey(11), (24, 16))

    out = pipeline_apply(mlp_stage, stacked, x, mesh, axis="model",
                         num_microbatches=8)
    ref = sequential(stages, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-6, atol=1e-6)


def test_pipeline_transformer_trunk():
    """A real trunk: 8-layer TransformerEncoder split into 4 pipeline
    stages of 2 layers each matches the unrolled forward."""
    from mmf_tpu.modules.transformer import (
        TransformerConfig, TransformerEncoder, TransformerLayer,
    )

    cfg = TransformerConfig(
        hidden_size=32, num_attention_heads=4, intermediate_size=64,
        num_hidden_layers=8, vocab_size=100, max_position_embeddings=16,
    )
    enc = TransformerEncoder(cfg)
    x = jax.random.normal(jax.random.PRNGKey(12), (8, 6, 32))
    params = enc.init(jax.random.PRNGKey(13), x)["params"]
    ref = enc.apply({"params": params}, x)

    mesh = make_mesh(4)
    stage_params = trunk_pipeline_params(params, n_stages=4)
    layer = TransformerLayer(cfg)
    stage_fn = pipeline_transformer_stage(layer)
    bias = jnp.zeros((8, 1, 1, 6), jnp.float32)
    out = pipeline_apply(stage_fn, stage_params, x, mesh, axis="model",
                         num_microbatches=4, extras=(bias,))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_pipeline_batch_divisibility_error():
    mesh = make_mesh(4)
    stages = init_mlp_stages(jax.random.PRNGKey(14), 4, d=4, hidden=4)
    stacked = stack_stage_params(stages)
    x = jnp.zeros((10, 4))
    with pytest.raises(AssertionError, match="not divisible"):
        pipeline_apply(mlp_stage, stacked, x, mesh, axis="model",
                       num_microbatches=4)


def test_pipeline_composes_with_data_parallel():
    """dp x pp on one mesh: batch sharded over 'data', stages over
    'model' (pipeline_apply's batch_axis), params stage-sharded —
    forward AND backward match the unpipelined sequential stack.
    The composition the multi-chip dryrun exercises stage-by-stage,
    asserted here in one jitted train step."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    devs = jax.devices()
    mesh = Mesh(np.asarray(devs).reshape(2, 4), ("data", "model"))

    stages = init_mlp_stages(jax.random.PRNGKey(21), 4)
    stacked = stack_stage_params(stages)
    stacked = jax.device_put(stacked, stage_params_sharding(mesh, "model"))
    x = jax.random.normal(jax.random.PRNGKey(22), (16, 16))
    x = jax.device_put(x, NamedSharding(mesh, P("data", None)))

    def loss_pp(stacked, x):
        out = pipeline_apply(
            mlp_stage, stacked, x, mesh, axis="model",
            num_microbatches=4, batch_axis="data",
        )
        return jnp.sum(out ** 2), out

    (val, out), grads = jax.jit(
        jax.value_and_grad(loss_pp, has_aux=True)
    )(stacked, x)

    def loss_ref(stages, x):
        return jnp.sum(sequential(stages, x) ** 2), sequential(stages, x)

    (val_ref, out_ref), grads_ref = jax.value_and_grad(
        loss_ref, has_aux=True
    )(stages, jax.device_get(x))

    np.testing.assert_allclose(np.asarray(out), np.asarray(out_ref),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(float(val), float(val_ref), rtol=1e-6)
    grads_ref_stacked = stack_stage_params(grads_ref)
    for (pa, ga), (pb, gb) in zip(
        jax.tree_util.tree_flatten_with_path(grads)[0],
        jax.tree_util.tree_flatten_with_path(grads_ref_stacked)[0],
    ):
        assert pa == pb
        np.testing.assert_allclose(np.asarray(ga), np.asarray(gb),
                                   rtol=1e-5, atol=1e-6)
