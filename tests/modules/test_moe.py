"""MoE feed-forward + expert parallelism (beyond reference parity —
SURVEY.md §2.10 marks EP "ABSENT" in MMF).

Runs on the 8-virtual-device CPU mesh from conftest.py.
"""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from mmf_tpu.modules.moe import (
    MoEFeedForward,
    collect_moe_aux_loss,
    expert_capacity,
    top_k_gating,
)


def test_expert_capacity():
    assert expert_capacity(64, 8, 1, 1.0) == 8
    assert expert_capacity(64, 8, 2, 1.0) == 16
    assert expert_capacity(64, 8, 2, 1.25) == 20
    assert expert_capacity(2, 8, 1, 1.0) == 1  # floor of 1


def test_gating_single_expert_routes_everything():
    logits = jnp.zeros((6, 1))
    dispatch, combine, aux = top_k_gating(logits, top_k=1, capacity=6)
    # every token gets gate 1.0 into the one expert, distinct slots
    np.testing.assert_allclose(np.asarray(combine.sum(axis=(1, 2))), 1.0)
    assert float(dispatch.sum()) == 6.0
    np.testing.assert_allclose(float(aux), 1.0, rtol=1e-6)


def test_gating_capacity_drops_overflow():
    # all tokens prefer expert 0; capacity 2 keeps the first 2 only
    logits = jnp.tile(jnp.asarray([[10.0, 0.0]]), (5, 1))
    dispatch, combine, _ = top_k_gating(logits, top_k=1, capacity=2)
    kept = np.asarray(dispatch[:, 0, :].sum(axis=-1))
    np.testing.assert_array_equal(kept, [1, 1, 0, 0, 0])
    assert float(dispatch[:, 1, :].sum()) == 0.0


def test_gating_top2_normalized_gates():
    logits = jax.random.normal(jax.random.PRNGKey(0), (16, 4))
    dispatch, combine, _ = top_k_gating(logits, top_k=2, capacity=16)
    mass = np.asarray(combine.sum(axis=(1, 2)))
    # ample capacity: normalized top-2 gates sum to 1 per token
    np.testing.assert_allclose(mass, np.ones(16), rtol=1e-5)
    # each token occupies exactly two expert slots
    np.testing.assert_array_equal(
        np.asarray(dispatch.sum(axis=(1, 2))), np.full(16, 2.0))


def test_gating_slot_positions_unique():
    logits = jax.random.normal(jax.random.PRNGKey(1), (32, 4))
    dispatch, _, _ = top_k_gating(logits, top_k=2, capacity=16)
    # no expert slot (e, c) is used by two tokens
    per_slot = np.asarray(dispatch.sum(axis=0))
    assert per_slot.max() <= 1.0


def test_moe_ffn_single_expert_matches_dense_math():
    """E=1, k=1, ample capacity: the MoE layer is exactly
    LN(x + W2 gelu(W1 x)) with its own weights."""
    moe = MoEFeedForward(num_experts=1, hidden_size=8,
                         intermediate_size=16, top_k=1,
                         capacity_factor=2.0, dropout_rate=0.0)
    x = jax.random.normal(jax.random.PRNGKey(2), (2, 3, 8))
    variables = moe.init(jax.random.PRNGKey(3), x)
    out = moe.apply(variables, x)

    p = variables["params"]
    tokens = x.reshape(6, 8)
    ref = tokens @ p["wi"][0]
    ref = jax.nn.gelu(ref) @ p["wo"][0]
    ln = p["ln"]
    y = ref.reshape(2, 3, 8) + x
    mu = y.mean(-1, keepdims=True)
    var = ((y - mu) ** 2).mean(-1, keepdims=True)
    ref_out = (y - mu) / jnp.sqrt(var + 1e-12) * ln["scale"] + ln["bias"]
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref_out),
                               rtol=1e-5, atol=1e-5)


def test_moe_ffn_sows_aux_loss_and_grads_flow():
    moe = MoEFeedForward(num_experts=4, hidden_size=8,
                         intermediate_size=16, top_k=2)
    x = jax.random.normal(jax.random.PRNGKey(4), (4, 5, 8))
    variables = moe.init(jax.random.PRNGKey(5), x)

    def loss(params):
        out, inter = moe.apply(
            {"params": params}, x, mutable=["intermediates"])
        aux = collect_moe_aux_loss(inter["intermediates"])
        return jnp.sum(out ** 2) + 0.01 * aux

    g = jax.grad(loss)(variables["params"])
    leaves = jax.tree_util.tree_leaves(g)
    assert all(bool(jnp.all(jnp.isfinite(l))) for l in leaves)
    # router receives gradient through both combine weights and aux
    assert float(jnp.max(jnp.abs(g["router"]["kernel"]))) > 0


def test_moe_expert_parallel_matches_replicated():
    """Expert-sharded weights over an 8-device mesh produce the same
    outputs as the unsharded apply (GSPMD inserts the collectives)."""
    from mmf_tpu.parallel.mesh import param_sharding_tree

    mesh = Mesh(np.asarray(jax.devices()).reshape(1, 8),
                ("data", "model"))
    moe = MoEFeedForward(num_experts=8, hidden_size=8,
                         intermediate_size=16, top_k=2,
                         capacity_factor=2.0)
    x = jax.random.normal(jax.random.PRNGKey(6), (4, 6, 8))
    variables = moe.init(jax.random.PRNGKey(7), x)
    ref = moe.apply(variables, x)

    # wrap as a trunk-style tree so the moe_ffn path rule applies
    wrapped = {"moe_ffn": variables["params"]}
    shardings = param_sharding_tree(wrapped, mesh)
    assert shardings["moe_ffn"]["wi"].spec == P("model", None, None)
    assert shardings["moe_ffn"]["wo"].spec == P("model", None, None)
    placed = jax.device_put(wrapped, shardings)

    @jax.jit
    def fwd(p, x_):
        return moe.apply({"params": p["moe_ffn"]}, x_)

    with mesh:
        out = fwd(placed, jax.device_put(
            x, NamedSharding(mesh, P())))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_trunk_moe_layers_config():
    """moe_experts in TransformerConfig swaps every moe_every-th layer's
    FFN for the MoE block; param tree shows moe_ffn exactly there."""
    from mmf_tpu.modules.transformer import (
        TransformerConfig, TransformerEncoder,
    )

    cfg = TransformerConfig(
        hidden_size=16, num_attention_heads=2, intermediate_size=32,
        num_hidden_layers=4, moe_experts=4, moe_every=2,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
    )
    enc = TransformerEncoder(cfg)
    x = jax.random.normal(jax.random.PRNGKey(8), (2, 5, 16))
    variables = enc.init(jax.random.PRNGKey(9), x)
    params = variables["params"]
    assert "ffn" in params["layer_0"] and "moe_ffn" not in params["layer_0"]
    assert "moe_ffn" in params["layer_1"] and "ffn" not in params["layer_1"]
    assert "ffn" in params["layer_2"]
    assert "moe_ffn" in params["layer_3"]
    assert params["layer_1"]["moe_ffn"]["wi"].shape == (4, 16, 32)

    out, inter = enc.apply({"params": params}, x,
                           mutable=["intermediates"])
    assert out.shape == (2, 5, 16)
    aux = collect_moe_aux_loss(inter["intermediates"])
    assert float(aux) > 0.5  # two MoE layers, each >= ~1 at init


def test_train_step_applies_moe_aux_loss():
    """training.moe_aux_weight wiring: make_train_step with
    moe_aux_weight > 0 must surface the sowed load-balance loss in the
    report AND feed it gradients (the router must receive a balancing
    signal, not just the combine-weight gradient)."""
    import flax.linen as nn
    import optax

    from mmf_tpu.trainers.core.train_state import (
        create_train_state, make_train_step,
    )

    class TinyMoEModel(nn.Module):
        @nn.compact
        def __call__(self, batch, train, **kw):
            x = batch["x"]
            h = MoEFeedForward(num_experts=4, hidden_size=8,
                               intermediate_size=16, top_k=2)(
                x, deterministic=not train)
            return {"scores": h.sum(axis=(1, 2))}

    model = TinyMoEModel()
    x = jax.random.normal(jax.random.PRNGKey(0), (4, 5, 8))
    batch = {"x": x, "targets": jnp.zeros((4,))}
    variables = model.init(jax.random.PRNGKey(1), batch, False)

    def losses_fn(b, out):
        return {"train/toy/mse": jnp.mean((out["scores"] - b["targets"]) ** 2)}

    tx = optax.sgd(0.1)
    step = make_train_step(
        model.apply, losses_fn, tx, moe_aux_weight=0.01)
    state = create_train_state(variables, tx, jax.random.PRNGKey(2))
    new_state, report = jax.jit(step)(state, batch)

    assert "moe_aux_loss" in report["losses"]
    aux = float(report["losses"]["moe_aux_loss"])
    assert aux > 0.005  # ~0.01 * (aux ~= 1 at init)
    # 'intermediates' must never leak into persistent state
    assert set(new_state.variables.keys()) == {"params"}
    # without the weight the key must be absent (backwards compatible)
    step0 = make_train_step(model.apply, losses_fn, tx)
    _, report0 = jax.jit(step0)(
        create_train_state(variables, tx, jax.random.PRNGKey(2)), batch)
    assert "moe_aux_loss" not in report0["losses"]


def test_train_step_moe_aux_with_grad_accumulation():
    """The aux loss must survive the lax.scan microbatch path too."""
    import flax.linen as nn
    import optax

    from mmf_tpu.trainers.core.train_state import (
        create_train_state, make_train_step,
    )

    class TinyMoEModel(nn.Module):
        @nn.compact
        def __call__(self, batch, train, **kw):
            h = MoEFeedForward(num_experts=2, hidden_size=8,
                               intermediate_size=16, top_k=1)(
                batch["x"], deterministic=not train)
            return {"scores": h.sum(axis=(1, 2))}

    model = TinyMoEModel()
    x = jax.random.normal(jax.random.PRNGKey(3), (4, 5, 8))
    batch = {"x": x, "targets": jnp.zeros((4,))}
    variables = model.init(jax.random.PRNGKey(4), batch, False)

    def losses_fn(b, out):
        return {"train/toy/mse": jnp.mean((out["scores"] - b["targets"]) ** 2)}

    tx = optax.sgd(0.1)
    step = make_train_step(
        model.apply, losses_fn, tx, update_frequency=2,
        moe_aux_weight=0.01)
    state = create_train_state(variables, tx, jax.random.PRNGKey(5))
    _, report = jax.jit(step)(state, batch)
    assert float(report["losses"]["moe_aux_loss"]) > 0.0
