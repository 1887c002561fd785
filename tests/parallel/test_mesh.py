"""Mesh construction and tensor-parallel sharding rules on the virtual
8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mmf_tpu.config import omega
from mmf_tpu.parallel import mesh as mesh_lib


def _mesh(dp, tp):
    devices = jax.devices()[: dp * tp]
    from jax.sharding import Mesh

    return Mesh(np.asarray(devices).reshape(dp, tp), ("data", "model"))


def test_build_mesh_from_config():
    cfg = omega.create({"distributed": {"mesh": {"data": -1, "model": 2}}})
    mesh = mesh_lib.build_mesh(cfg)
    assert mesh.shape["model"] == 2
    assert mesh.shape["data"] == jax.device_count() // 2


def test_param_sharding_replicated_when_tp1():
    mesh = _mesh(8, 1)
    params = {"encoder": {"layer_0": {"attention": {"query": {
        "kernel": jnp.ones((32, 32))}}}}}
    tree = mesh_lib.param_sharding_tree(params, mesh)
    spec = tree["encoder"]["layer_0"]["attention"]["query"]["kernel"].spec
    assert all(s is None for s in spec) or len(spec) == 0


def test_param_sharding_tp_rules():
    from jax.sharding import PartitionSpec as P

    mesh = _mesh(2, 4)
    params = {
        "attention": {
            "query": {"kernel": jnp.ones((32, 32)),
                      "bias": jnp.ones((32,))},
            "output_dense": {"kernel": jnp.ones((32, 32)),
                             "bias": jnp.ones((32,))},
        },
        "ffn": {
            "intermediate_dense": {"kernel": jnp.ones((32, 64))},
            "output_dense": {"kernel": jnp.ones((64, 32))},
        },
        "embeddings": {
            "word_embeddings": {"embedding": jnp.ones((64, 32))},
            "layer_norm": {"scale": jnp.ones((32,))},
        },
        "odd": {"query": {"kernel": jnp.ones((32, 30))}},  # 30 % 4 != 0
    }
    tree = mesh_lib.param_sharding_tree(params, mesh)
    assert tree["attention"]["query"]["kernel"].spec == P(None, "model")
    assert tree["attention"]["query"]["bias"].spec == P("model")
    assert tree["attention"]["output_dense"]["kernel"].spec == P("model", None)
    # row-parallel bias stays replicated (full output dim)
    assert tree["attention"]["output_dense"]["bias"].spec in (P(), P(None))
    assert tree["ffn"]["intermediate_dense"]["kernel"].spec == P(None, "model")
    assert tree["ffn"]["output_dense"]["kernel"].spec == P("model", None)
    assert tree["embeddings"]["word_embeddings"]["embedding"].spec == \
        P("model", None)
    assert tree["embeddings"]["layer_norm"]["scale"].spec in (P(), P(None))
    # non-divisible dims fall back to replicated
    assert tree["odd"]["query"]["kernel"].spec in (P(), P(None))


def test_tp_matches_replicated_numerics():
    """The same matmul under TP shardings must produce the same result —
    GSPMD is semantics-preserving."""
    mesh = _mesh(2, 4)
    x = jnp.asarray(np.random.RandomState(0).randn(8, 32), jnp.float32)
    w_up = jnp.asarray(np.random.RandomState(1).randn(32, 64), jnp.float32)
    w_down = jnp.asarray(np.random.RandomState(2).randn(64, 32), jnp.float32)

    def f(x, w_up, w_down):
        return jax.nn.relu(x @ w_up) @ w_down

    expected = f(x, w_up, w_down)

    from jax.sharding import NamedSharding, PartitionSpec as P

    xs = jax.device_put(x, NamedSharding(mesh, P("data")))
    w_up_s = jax.device_put(w_up, NamedSharding(mesh, P(None, "model")))
    w_down_s = jax.device_put(w_down, NamedSharding(mesh, P("model", None)))
    got = jax.jit(f)(xs, w_up_s, w_down_s)
    # reduction order differs across shards: exact to ~1e-6 relative
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected),
                               rtol=1e-5, atol=1e-5)


def test_dryrun_multichip_tp():
    import __graft_entry__ as g

    g.dryrun_multichip(8)  # asserts tensor-sharded leaves internally


def test_full_model_forward_tp_matches_replicated():
    """A REAL trunk (tiny VisualBERT) under tensor-parallel param
    shardings must reproduce the replicated forward bit-for-tolerance —
    the model-level version of the matmul check above, covering the
    q/k/v/FFN column rules, output-dense row rule, and vocab-sharded
    embedding together with GSPMD's inserted collectives."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    import __graft_entry__ as g

    model = g._visual_bert(
        {
            "vocab_size": 64,
            "hidden_size": 32,
            "num_hidden_layers": 2,
            "num_attention_heads": 4,
            "intermediate_size": 64,
            "visual_embedding_dim": 8,
            "max_position_embeddings": 32,
            "num_labels": 4,
            "dtype": "float32",
        }
    )
    B = 8
    rng = np.random.RandomState(0)
    batch = {
        "input_ids": jnp.asarray(rng.randint(0, 64, (B, 8))),
        "input_mask": jnp.ones((B, 8), jnp.int32),
        "segment_ids": jnp.zeros((B, 8), jnp.int32),
        "image_feature_0": jnp.asarray(
            rng.randn(B, 4, 8).astype(np.float32)
        ),
        "image_info_0": {"max_features": jnp.full((B,), 4, jnp.int32)},
    }
    meta = {"dataset_name": "vqa2", "dataset_type": "val"}
    variables = model.init(jax.random.PRNGKey(0), dict(batch, **meta), False)

    expected = model.apply(variables, dict(batch, **meta), False)["scores"]

    mesh = _mesh(2, 4)
    tree = mesh_lib.param_sharding_tree(variables, mesh)
    # the rules must actually shard something on this trunk
    n_model_sharded = sum(
        1
        for leaf in jax.tree_util.tree_leaves(tree)
        if any(s == "model" for s in jax.tree_util.tree_leaves(
            tuple(x for x in leaf.spec if x is not None)))
    )
    assert n_model_sharded >= 10, n_model_sharded

    sharded_vars = jax.device_put(variables, tree)
    sharded_batch = jax.device_put(batch, NamedSharding(mesh, P("data")))

    got = jax.jit(
        lambda v, b: model.apply(v, dict(b, **meta), False)["scores"]
    )(sharded_vars, sharded_batch)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(expected), rtol=1e-5, atol=1e-5
    )
