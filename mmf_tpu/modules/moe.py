"""Mixture-of-experts feed-forward with expert parallelism.

Beyond reference parity (MMF has no expert parallelism — SURVEY.md §2.10
marks TP/PP/SP/EP "ABSENT"): a GShard/Switch-style token-choice MoE FFN
whose stacked expert weights shard their expert axis over a mesh axis.
Dispatch and combine are expressed as dense einsums against one-hot
dispatch tensors — the Mesh-TensorFlow formulation — so GSPMD inserts
the expert all-to-alls itself and every shape stays static (XLA-friendly:
no ragged routing, capacity-dropped tokens simply get zero combine
weight and ride the residual connection).

Pieces:
  - ``top_k_gating``: iterative top-k routing with per-expert capacity,
    position-in-expert via cumsum, GShard gate renormalization for k>1,
    and the Switch load-balance auxiliary loss.
  - ``MoEFeedForward``: drop-in replacement for the trunk's dense FFN
    (modules/transformer.py FeedForward) gated by
    ``TransformerConfig.moe_experts``; params ``wi``/``wo`` are
    [E, d, f]/[E, f, d] so ``parallel.mesh.param_sharding_tree`` can
    place one expert slab per device (P("model") on the leading axis).

The auxiliary load-balance loss is sowed under
``intermediates/moe_aux_loss``; trainers add
``moe_aux_weight * sum(aux)`` to the task loss.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


def expert_capacity(num_tokens: int, num_experts: int, top_k: int,
                    capacity_factor: float) -> int:
    """Per-expert token capacity: ceil(k*T/E * factor), at least 1."""
    cap = int(-(-num_tokens * top_k * capacity_factor // num_experts))
    return max(cap, 1)


def top_k_gating(
    router_logits: jax.Array,
    top_k: int,
    capacity: int,
    normalize_gates: bool = True,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Token-choice routing.

    router_logits: [T, E] (f32 recommended).
    Returns (dispatch [T, E, C] in {0,1}, combine [T, E, C] gate weights,
    aux_loss scalar — the Switch E * sum_e(mean_prob_e * mean_frac_e)
    balance loss, which is 1.0 at perfect uniformity).
    """
    t, e = router_logits.shape
    probs = jax.nn.softmax(router_logits.astype(jnp.float32), axis=-1)

    gates, masks = [], []
    remaining = probs
    for _ in range(top_k):
        idx = jnp.argmax(remaining, axis=-1)
        onehot = jax.nn.one_hot(idx, e, dtype=jnp.float32)
        gates.append(jnp.sum(probs * onehot, axis=-1))
        masks.append(onehot)
        remaining = remaining * (1.0 - onehot)

    # aux loss uses the first-choice assignment fraction (GShard eq. 4)
    mean_prob = jnp.mean(probs, axis=0)
    mean_frac = jnp.mean(masks[0], axis=0)
    aux_loss = e * jnp.sum(mean_prob * mean_frac)

    if top_k > 1 and normalize_gates:
        denom = sum(gates) + 1e-9
        gates = [g / denom for g in gates]

    # position-in-expert: earlier slots fill capacity first
    combine = jnp.zeros((t, e, capacity), jnp.float32)
    offset = jnp.zeros((e,), jnp.float32)
    for gate, mask in zip(gates, masks):
        pos_in_slot = jnp.cumsum(mask, axis=0) - mask          # [T, E]
        position = jnp.sum((pos_in_slot + offset[None, :]) * mask,
                           axis=-1)                            # [T]
        chosen = jnp.sum(mask, axis=-1)                        # [T] 0/1
        keep = chosen * (position < capacity)
        pos_onehot = jax.nn.one_hot(position.astype(jnp.int32), capacity,
                                    dtype=jnp.float32)         # [T, C]
        combine = combine + (gate * keep)[:, None, None] \
            * mask[:, :, None] * pos_onehot[:, None, :]
        offset = offset + jnp.sum(mask, axis=0)

    dispatch = (combine > 0.0).astype(jnp.float32)
    return dispatch, combine, aux_loss


class MoEFeedForward(nn.Module):
    """Switch/GShard MoE FFN block: LN-residual wiring matches the dense
    ``FeedForward`` it replaces so the trunk's activation contract is
    unchanged (capacity-dropped tokens pass through on the residual)."""

    num_experts: int
    hidden_size: int
    intermediate_size: int
    top_k: int = 2
    capacity_factor: float = 1.25
    activation: Any = nn.gelu
    layer_norm_eps: float = 1e-12
    dropout_rate: float = 0.0
    dtype: Any = jnp.float32
    normalize_gates: bool = True

    @nn.compact
    def __call__(self, hidden: jax.Array, deterministic: bool = True,
                 capacity: Optional[int] = None) -> jax.Array:
        b, s, d = hidden.shape
        tokens = hidden.reshape(b * s, d)
        n_tok = b * s
        cap = capacity or expert_capacity(
            n_tok, self.num_experts, self.top_k, self.capacity_factor)

        # router in f32 for stable softmax regardless of compute dtype
        router = nn.Dense(
            self.num_experts, use_bias=False, name="router",
            dtype=jnp.float32,
            kernel_init=nn.initializers.normal(stddev=0.02),
        )
        dispatch, combine, aux = top_k_gating(
            router(tokens.astype(jnp.float32)), self.top_k, cap,
            self.normalize_gates)
        self.sow("intermediates", "moe_aux_loss", aux)

        wi = self.param(
            "wi", nn.initializers.normal(stddev=0.02),
            (self.num_experts, d, self.intermediate_size))
        wo = self.param(
            "wo", nn.initializers.normal(stddev=0.02),
            (self.num_experts, self.intermediate_size, d))

        cdt = self.dtype
        x = tokens.astype(cdt)
        # [T, E, C] x [T, D] -> [E, C, D]; GSPMD turns the expert axis
        # into the EP all-to-all when wi/wo are sharded over it
        expert_in = jnp.einsum("tec,td->ecd", dispatch.astype(cdt), x)
        h = self.activation(
            jnp.einsum("ecd,edf->ecf", expert_in, wi.astype(cdt)))
        expert_out = jnp.einsum("ecf,efd->ecd", h, wo.astype(cdt))
        y = jnp.einsum("tec,ecd->td", combine.astype(cdt), expert_out)

        y = y.reshape(b, s, d).astype(hidden.dtype)
        if self.dropout_rate:
            y = nn.Dropout(self.dropout_rate)(
                y, deterministic=deterministic)
        out = nn.LayerNorm(epsilon=self.layer_norm_eps, name="ln",
                           dtype=jnp.float32)(y + hidden)
        return out.astype(hidden.dtype)


def collect_moe_aux_loss(intermediates: Any) -> jax.Array:
    """Sum every ``moe_aux_loss`` sowed across the model's MoE layers
    (0.0 when the model has none)."""
    total = jnp.asarray(0.0, jnp.float32)
    flat = jax.tree_util.tree_flatten_with_path(intermediates)[0]
    for path, leaf in flat:
        names = [str(getattr(p, "key", getattr(p, "name", ""))) for p in path]
        if any(n == "moe_aux_loss" for n in names):
            total = total + jnp.sum(jnp.asarray(leaf, jnp.float32))
    return total
